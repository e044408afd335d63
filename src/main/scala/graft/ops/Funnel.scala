package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for each user, the
  * earliest time they completed step 1, then step 2 STRICTLY AFTER
  * their step-1 time, and so on — the standard product-analytics
  * conversion query, expressed as one aggregate + one join per step.
  *
  * Scale shape: step k is `events[type=k] ⋈ reached(k−1)` on the user
  * key followed by a min-aggregate — no window over a user's whole
  * history, no per-user event sort, no driver loop over users. The
  * `reached` frame only ever shrinks (funnels narrow), and each join
  * shuffles the one event-type slice, not the full stream. Equal-time
  * edges: a later step at exactly the same timestamp does NOT count
  * (strict `>`), the conservative reading used by the differential
  * oracle too.
  */
object Funnel {

  /** Per-user funnel times: (userCol, t_1, …, t_n), one row per user
    * who completed at least step 1; t_k is NULL once the user stalls.
    * `steps` are the event-type values in funnel order. */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(col(tsCol)).as("t_1"))
    val reachedAll = steps.zipWithIndex.drop(1)
      .foldLeft(List(first)) { case (acc @ (prev :: _), (step, i)) =>
        val next = events.filter(col(typeCol) === step)
          .join(prev.select(col(userCol), col(s"t_$i")), userCol)
          .filter(col(tsCol) > col(s"t_$i"))
          .groupBy(userCol).agg(min(col(tsCol)).as(s"t_${i + 1}"))
        next :: acc
      }.reverse
    reachedAll.tail.foldLeft(reachedAll.head) { (out, stage) =>
      out.join(stage, Seq(userCol), "left")
    }
  }

  /** Stage-level conversion counts: (stage index 1-based, step name,
    * users remaining). Derived from [[funnelTimes]] in one pass. */
  def funnelSummary(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, steps: Seq[String]): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps)
    val counts = times.agg(
      count(col("t_1")).as("c_1"),
      steps.indices.drop(1).map(i => count(col(s"t_${i + 1}")).as(s"c_${i + 1}")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("stage"), lit(s).as("step"),
        col(s"c_${i + 1}").as("n_users"))
    }: _*)).as("r")).select("r.stage", "r.step", "r.n_users")
  }
}
