package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over an event log — the
  * behavioral-analytics companion to [[Funnel]]/[[Cohort]]: for every
  * ordered pair of consecutive actions by the same key, how often does
  * `from_action` lead to `to_action`, and with what probability?
  * Standard input to session-path analysis, next-action prediction
  * baselines, and bot detection (improbable transition chains).
  *
  * Shape at 100 TB: one window pass partitioned by the entity key (each
  * user's history sorts inside its own task — user histories are bounded;
  * nothing global), then one `groupBy(from, to)` whose partial
  * aggregation collapses the pair stream to ≤ |actions|² rows per
  * partition before the shuffle. The probability normalization runs on
  * the aggregated matrix (|actions|² rows — trivially small), NOT on the
  * event stream. No driver action anywhere; the result is a lazy plan.
  *
  * Determinism contract: the event order within a key is (tsCol, tieCol)
  * — a total order, so `lead` is reproducible; `prob` is one IEEE double
  * division of exact long counts, bit-equal across engines.
  */
object Transitions {

  /** Consecutive-pair transition counts and row-normalized probabilities.
    * Returns (from_action, to_action, n, prob) where `prob` = n / Σ n
    * over the same `from_action`. Rows with no successor (each key's
    * last event) contribute no pair; NULL actions participate like any
    * other value (SQL GROUP BY semantics) but NULL keys are dropped —
    * an event stream's null entity has no path. */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                       actionCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    // lead over a STRUCT so end-of-history (null struct) is
    // distinguishable from a successor whose ACTION is NULL (non-null
    // struct, null field) — filtering on a bare lead(action) would
    // silently drop every transition INTO a null action and inflate the
    // surviving probabilities of the same from_action
    val pairs = events
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(actionCol).as("from_action"))
      .withColumn("__next", lead(struct(col("from_action").as("a")), 1).over(w))
      .filter(col("__next").isNotNull)
      .withColumn("to_action", col("__next")("a"))
      .drop("__next")
    val counts = pairs.groupBy("from_action", "to_action")
      .agg(count(lit(1)).as("n"))
    // normalization over the compact matrix: the per-from totals window
    // runs over ≤ |actions|² aggregated rows, never the event stream
    val wFrom = Window.partitionBy("from_action")
    counts.withColumn("prob",
      col("n").cast("double") / sum("n").over(wFrom).cast("double"))
  }

  /** Session path histogram: each (key, gap-session) becomes the ordered
    * `sep`-joined string of its actions, counted across the corpus — the
    * "what do users actually do" view behind funnel design and bot
    * fingerprinting. Sessionization is the native `session_window`
    * (events closer than `gap` merge — same rule as
    * [[graft.streaming.EventStreams.sessionStats]]).
    *
    * `collect_list` inside an aggregate has NO ordering guarantee, so
    * the path sorts post-hoc: events collect as (ts, tie, action)
    * structs and `array_sort`'s default struct comparator (field order =
    * ts, then tie) restores the total order deterministically. NULL
    * actions render as the literal "null" step — `array_join` would
    * otherwise SKIP them, collapsing ('a', NULL, 'b') into the same
    * path as a genuine a>b session. Per-group state is one session's
    * events — bounded by session length, never by key history. Returns
    * (path, n_sessions) — aggregated, tiny. */
  def sessionPaths(events: DataFrame, keyCol: String, tsCol: String,
                   actionCol: String, tieCol: String,
                   gap: String = "30 minutes", sep: String = ">"): DataFrame = {
    val paths = events
      .filter(col(keyCol).isNotNull)
      .groupBy(session_window(col(tsCol), gap).as("__w"), col(keyCol))
      .agg(array_sort(collect_list(struct(
        col(tsCol).as("ts"), col(tieCol).as("tie"),
        coalesce(col(actionCol), lit("null")).as("a")))).as("__evs"))
      .select(array_join(transform(col("__evs"), e => e("a")), sep).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
  }
}
