package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1/S2 — the reference's REST extract surface: HTTP GET with optional
  * bearer token plus the OAuth2 password flow that mints the token
  * (reference `dags/utils.py:29-69`; server side `Rest-API/main.py:66-98`,
  * `Rest-API/utils.py:44-67`).
  *
  * The transport is an injectable function so the connector is fully
  * testable offline (this build environment has zero egress); the default
  * transport is `java.net.http.HttpClient`. The fetch happens on the
  * driver — same as the reference — and the payload is parsed into rows
  * ON EXECUTORS via the JSON datasource ([[Sources.fromJsonRecords]]),
  * not driver-side dict loops.
  *
  * Scale note: a REST endpoint is inherently a single-stream source; at
  * scale you shard extracts by entity/date (the reference's dated-path
  * convention, S9) and land them to object storage, letting Spark scan
  * the landed files — this connector is the landing step.
  */
object Rest {

  /** (method, url, headers, form-encoded body) => (status, body). */
  type Http = (String, String, Map[String, String], Option[String]) => (Int, String)

  final case class OAuthConfig(tokenUrl: String, username: String, password: String)

  /** Default transport on java.net.http (driver-side). */
  val defaultTransport: Http = { (method, url, headers, body) =>
    val client = java.net.http.HttpClient.newHttpClient()
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = method match {
      case "POST" => b.POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(body.getOrElse(""))).build()
      case _ => b.GET().build()
    }
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private val TokenRe = """"access_token"\s*:\s*"([^"]+)"""".r

  /** OAuth2 password flow: POST form-encoded credentials to `/token`,
    * return the JWT (reference `dags/utils.py:40-54`). */
  def fetchToken(cfg: OAuthConfig, http: Http = defaultTransport): String = {
    val form = s"username=${enc(cfg.username)}&password=${enc(cfg.password)}"
    val (status, body) = http("POST", cfg.tokenUrl,
      Map("Content-Type" -> "application/x-www-form-urlencoded"), Some(form))
    require(status == 200, s"token endpoint returned $status")
    TokenRe.findFirstMatchIn(body).map(_.group(1))
      .getOrElse(throw new IllegalStateException("no access_token in response"))
  }

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** HTTP GET with optional bearer auth, returning the raw JSON payload. */
  def getJson(url: String, token: Option[String] = None,
              http: Http = defaultTransport): String = {
    val headers = token.map(t => Map("Authorization" -> s"Bearer $t"))
      .getOrElse(Map.empty)
    val (status, body) = http("GET", url, headers, None)
    require(status == 200, s"GET $url returned $status")
    body
  }

  /** Full extract: GET (+optional OAuth) → DataFrame. The JSON array
    * payload is parsed by Spark's JSON datasource (one top-level array
    * yields one row per element). */
  def extract(spark: SparkSession, url: String, auth: Option[OAuthConfig] = None,
              http: Http = defaultTransport): DataFrame = {
    val token = auth.map(cfg => fetchToken(cfg, http))
    Sources.fromJsonRecords(spark, Seq(getJson(url, token, http)))
  }
}
