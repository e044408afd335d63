package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded window of persisted frames, keyed by owning SparkSession.
  *
  * Why session-keyed rather than one JVM-global deque (the round-4
  * shape): two concurrent pipelines sharing a JVM used to share one
  * window and could evict each other's hot frames mid-plan. A window per
  * (module, session) gives a pipeline that wants full isolation the
  * standard Spark isolation unit — run in `spark.newSession()` and keep
  * the whole eviction budget; same-session work intentionally shares a
  * window, matching CacheManager semantics (cache entries are plan-keyed
  * and session-shared there anyway).
  *
  * Eviction only unpersists — never a wrong result, worst case a
  * recompute (an in-flight action holds its own reference to the frame).
  * Sessions are held weakly so a dropped session cannot pin its frames.
  */
private[graft] final class CacheWindows(maxPerSession: Int) {
  private val windows = new java.util.WeakHashMap[
    SparkSession, scala.collection.mutable.ArrayDeque[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK) and register it in its session's
    * window, evicting that session's oldest frame past the bound. */
  def add(df: DataFrame): DataFrame = synchronized {
    val w = windows.computeIfAbsent(df.sparkSession,
      _ => new scala.collection.mutable.ArrayDeque[DataFrame]())
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    w.append(p)
    while (w.length > maxPerSession) w.removeHead().unpersist(blocking = false)
    p
  }

  /** Unpersist and forget every frame registered by `spark`'s window;
    * other sessions' windows are untouched. */
  def release(spark: SparkSession): Unit = synchronized {
    Option(windows.remove(spark))
      .foreach(_.foreach(_.unpersist(blocking = false)))
  }

  /** Unpersist everything across all sessions (the historical
    * `releaseCaches()` contract). */
  def releaseAll(): Unit = synchronized {
    windows.values.forEach(w => w.foreach(_.unpersist(blocking = false)))
    windows.clear()
  }

  /** Frames currently registered for `spark` (spec/diagnostic surface). */
  def registered(spark: SparkSession): Seq[DataFrame] = synchronized {
    Option(windows.get(spark)).map(_.toSeq).getOrElse(Nil)
  }
}
