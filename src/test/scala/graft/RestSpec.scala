package graft

import graft.io.Rest

class RestSpec extends SparkSpec {

  /** Offline fake of the reference's FastAPI server: /token mints a JWT
    * for the right credentials; /v1/customers requires the bearer. */
  private val fakeServer: Rest.Http = { (method, url, headers, body) =>
    (method, url) match {
      case ("POST", "http://api/token") =>
        if (body.exists(b => b.contains("username=admin") && b.contains("password=p%40ss")))
          (200, """{"access_token": "jwt-abc", "token_type": "bearer"}""")
        else (401, """{"detail": "bad credentials"}""")
      case ("GET", "http://api/v1/suppliers") =>
        (200, """[{"supplier_id": "S0001", "supplier_name": "Acme", "region": "East"},
                 {"supplier_id": "S0002", "supplier_name": "Duke", "region": "West"}]""")
      case ("GET", "http://api/v1/customers") =>
        if (headers.get("Authorization").contains("Bearer jwt-abc"))
          (200, """[{"customer_id": "C00001", "name": "Sean"}]""")
        else (401, """{"detail": "Not authenticated"}""")
      case _ => (404, "{}")
    }
  }

  test("S2: OAuth token fetch posts form credentials and parses the JWT") {
    val tok = Rest.fetchToken(
      Rest.OAuthConfig("http://api/token", "admin", "p@ss"), fakeServer)
    assert(tok == "jwt-abc")
    intercept[IllegalArgumentException] {
      Rest.fetchToken(Rest.OAuthConfig("http://api/token", "admin", "wrong"), fakeServer)
    }
  }

  test("S1: open endpoint extract parses the JSON array into rows") {
    val df = Rest.extract(spark, "http://api/v1/suppliers", None, fakeServer)
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("region", "supplier_id", "supplier_name"))
  }

  test("S1+S2: gated endpoint works with auth, fails without") {
    val auth = Some(Rest.OAuthConfig("http://api/token", "admin", "p@ss"))
    val df = Rest.extract(spark, "http://api/v1/customers", auth, fakeServer)
    assert(df.select("customer_id").first().getString(0) == "C00001")
    intercept[IllegalArgumentException] {
      Rest.extract(spark, "http://api/v1/customers", None, fakeServer)
    }
  }
}
