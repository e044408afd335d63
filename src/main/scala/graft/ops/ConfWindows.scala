package graft.ops

import org.apache.spark.sql.SparkSession

/** JVM-shared, refcounted session-conf override windows.
  *
  * [[Quantiles]] and [[Classifier]] both pin `spark.sql.adaptive.enabled`
  * (and Quantiles the reduce width) around driver-coordinated rounds whose
  * reduce inputs are bounded by construction. Each used to carry its own
  * non-atomic save/restore, so two overlapping windows on one session
  * could interleave — A saves "true", B saves A's "false", A restores
  * "true", B restores "false" — and leave the session without AQE for the
  * rest of its life: a classic lost update. This object is the single
  * bookkeeper: the FIRST window to override a (session, key) records the
  * session's original value, nested/concurrent windows only bump a depth
  * counter, and the LAST one out restores (or unsets) the original.
  * Override values agree across callers by construction (AQE is always
  * pinned to "false"; the width override is the idempotent
  * `min(8, current)`), so last-writer-wins INSIDE a window is harmless.
  *
  * The monitor guards only the bookkeeping — the body runs unlocked, so
  * concurrent protocol windows (same session or not) never serialize
  * their Spark jobs, and nesting can't deadlock.
  */
private[graft] object ConfWindows {
  private final class Saved(val original: Option[String], var depth: Int,
                            val value: String)
  private val saved = new java.util.HashMap[(SparkSession, String), Saved]

  /** Run `f` with `overrides` applied to `spark`'s runtime conf,
    * restoring each key's pre-FIRST-window value once the LAST
    * overlapping window exits. The by-construction invariant that every
    * overlapping window pins the SAME value per (session, key) — true
    * for all current callers (AQE always "false"; the width override is
    * the idempotent min(8, current)) — is CHECKED, not assumed: a
    * nested window requesting a different value fails fast instead of
    * silently flipping the setting inside every open outer window. */
  def withOverrides[T](spark: SparkSession,
                       overrides: Seq[(String, String)])(f: => T): T = {
    synchronized {
      // VALIDATE first, MUTATE second: if the agreement require fired on
      // the Nth key after keys 1..N-1 had already bumped depth and set
      // conf, the exception (thrown before `try f`) would skip the
      // finally — those keys' depths would leak forever and the override
      // would stay pinned on the session for its lifetime. Both loops
      // run under one monitor hold, so the check-then-act is atomic.
      // agreement is checked against open windows AND against earlier
      // occurrences in THIS overrides seq: a duplicated key with two
      // values would otherwise pass validation (validate only consulted
      // pre-existing windows), silently bump depth twice, and pin the
      // FIRST value on exit while the body ran with the SECOND — the
      // exact silent flip this module exists to prevent (ADVICE r14)
      val inCall = scala.collection.mutable.HashMap.empty[String, String]
      overrides.foreach { case (k, v) =>
        val s = saved.get((spark, k))
        if (s != null)
          require(s.value == v,
            s"ConfWindows: nested window requests $k=$v while an open " +
              s"window holds $k=${s.value} — overlapping windows must " +
              "agree on the override value (it is pinned for the whole " +
              "overlap)")
        inCall.get(k).foreach { prev =>
          require(prev == v,
            s"ConfWindows: overrides list this window sets $k twice with " +
              s"disagreeing values ($prev then $v)")
        }
        inCall(k) = v
      }
      // conf.set can still throw (e.g. a static/immutable key): roll back
      // the keys already applied in THIS call before rethrowing, so a
      // partial failure leaves no depth bump or pinned value behind.
      val applied = scala.collection.mutable.ArrayBuffer.empty[String]
      try overrides.foreach { case (k, v) =>
        val key = (spark, k)
        val s = saved.get(key)
        if (s == null) saved.put(key, new Saved(spark.conf.getOption(k), 1, v))
        else s.depth += 1
        applied += k
        spark.conf.set(k, v)
      } catch { case t: Throwable =>
        applied.foreach { k =>
          val key = (spark, k)
          val s = saved.get(key)
          if (s != null) {
            s.depth -= 1
            if (s.depth == 0) {
              saved.remove(key)
              try s.original match {
                case Some(v) => spark.conf.set(k, v)
                case None => spark.conf.unset(k)
              } catch { case _: Throwable => () } // best-effort restore
            }
          }
        }
        throw t
      }
    }
    try f
    finally synchronized {
      overrides.foreach { case (k, _) =>
        val key = (spark, k)
        val s = saved.get(key)
        if (s != null) { // null only if a releaseAll-style external reset raced us
          s.depth -= 1
          if (s.depth == 0) {
            saved.remove(key)
            s.original match {
              case Some(v) => spark.conf.set(k, v)
              case None => spark.conf.unset(k)
            }
          }
        }
      }
    }
  }
}
