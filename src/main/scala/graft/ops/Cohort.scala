package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: users are grouped by the day
  * they first appeared (the cohort), and each later active day counts
  * them at `day_offset = active_day − cohort_day` — the classic
  * retention triangle.
  *
  * Scale shape: one min-aggregate keyed by user (the cohort
  * assignment), one join of the event stream back to it on the user
  * key, a distinct over (user, cohort, day) — so a user counts once
  * per active day — and a final count keyed by (cohort, offset). All
  * four are plain hash-shuffle operators on bounded keys; nothing is
  * windowed per user and nothing collects to the driver. */
object Cohort {

  /** (cohort_day DATE, day_offset BIGINT, n_users BIGINT), one row per
    * (cohort, offset) with at least one active user. Offset 0 is the
    * cohort's first day, so every cohort has an offset-0 row counting
    * its full size. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val cohorts = events.groupBy(userCol)
      .agg(min(col(tsCol)).cast("date").as("cohort_day"))
    events.select(col(userCol), col(tsCol).cast("date").as("active_day"))
      .join(cohorts, userCol)
      .select(col(userCol), col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).cast("long").as("day_offset"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
