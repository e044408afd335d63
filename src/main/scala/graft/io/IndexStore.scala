package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tiny parquet-backed build-once store for corpus indexes (DSIR feature
  * frames, lexical postings, PQ code tables): `getOrBuild` materializes
  * the frame to parquet under a content-versioned key on FIRST use and
  * every later call — across sessions and bench passes — reads the
  * parquet back without re-running the build.
  *
  * This is the deployment shape the indexed query variants measure: at
  * 100 TB an index is an artifact with its own build job (hours,
  * scheduled) and its own storage path; queries pay the READ side only.
  * Keys embed a caller-supplied version so a change to a build's
  * dataflow invalidates stale artifacts instead of silently reusing
  * them; keys embed the fixture dir so sf0.01 / sf0.1 / replica builds
  * never collide.
  *
  * The store root is /tmp by default (dev/bench artifact, not engine
  * state) — point GRAFT_INDEX_STORE at durable storage for real use. */
object IndexStore {

  private def root: String =
    sys.env.getOrElse("GRAFT_INDEX_STORE", "/tmp/graft_index_store")

  /** Filesystem-safe key component for a fixture dir. */
  def keyOf(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Read the index at `key`, building + persisting it first if absent.
    * Presence = parquet _SUCCESS marker (a killed half-write rebuilds).
    * Synchronized: concurrent first-callers in one JVM build once. */
  def getOrBuild(spark: SparkSession, key: String)
                (build: => DataFrame): DataFrame = synchronized {
    val path = s"$root/$key"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      System.err.println(s"[index-store] building $key")
      build.write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Drop one stored index (test hygiene / forced rebuild). */
  def invalidate(key: String): Unit = synchronized {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    val f = new java.io.File(s"$root/$key")
    if (f.exists()) rm(f)
  }
}
