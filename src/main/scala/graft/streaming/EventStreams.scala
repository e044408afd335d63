package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming extension over the `events` fixture (the reference
  * is pure daily batch — SURVEY.md §2.10 — so this is additive capability,
  * built the Spark-first way: one declarative transform that runs
  * identically over a batch DataFrame or a `readStream` source).
  *
  * Scale posture: tumbling/session windows shuffle by (window, key) —
  * embarrassingly parallel; watermarks bound state so a 100 TB/day stream
  * holds only the open windows per key in the state store.
  */
object EventStreams {

  /** Fixture schema (TESTDATA.md) — required up front for readStream. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream over a directory of parquet event files. The
    * schema is taken from a batch read of the same directory (streaming
    * sources require one up front), then [[normalizeTs]] repairs the
    * fixture's `ts` column. Event-time watermarks reject TIMESTAMP_NTZ
    * (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`), so a naive-timestamp
    * fixture is additionally cast to TIMESTAMP here — value-preserving
    * under the UTC session timezone every graft entry point pins. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val s = normalizeTs(spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir))
    s.schema("ts").dataType match {
      case TimestampNTZType => s.withColumn("ts", col("ts").cast(TimestampType))
      case _ => s
    }
  }

  /** Normalizes the fixture's `ts` column across the parquet flavors the
    * driver has shipped:
    *   - TIMESTAMP(NANOS) read as LongType nanos (requires
    *     `spark.sql.legacy.parquet.nanosAsLong`, set in every graft
    *     session builder): truncating `div` to micros matches DuckDB's
    *     nanos→micros read exactly (`div` truncates toward zero; epochs
    *     are positive).
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false), i.e. TIMESTAMP_NTZ:
    *     kept as-is. Batch operators (window, session_window, date
    *     functions, range windows) all accept NTZ, and writing NTZ back
    *     out produces naive parquet — exactly what the DuckDB oracle
    *     computes from the same naive inputs, so result hashes match
    *     without any timezone assumption.
    *   - TIMESTAMP (LTZ): already normalized, no-op. */
  def normalizeTs(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/`: double division loses precision above 2^53
        events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => events
    }

  /** Tumbling-window stats per event type. Works on batch and streaming
    * input alike; pass a watermark for streaming so state is bounded and
    * late data beyond it is dropped. The value sum is DECIMAL(12,2) —
    * exact and aggregation-order-independent (fixture values are
    * 2-decimal), so batch results hash-match the DuckDB oracle. */
  def tumblingStats(events: DataFrame, windowLen: String = "1 hour",
                    watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(w => events.withWatermark("ts", w)).getOrElse(events)
    src.groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"), col("min_value"), col("max_value"))
  }

  /** Sliding-window stats per event type: each event contributes to
    * `len/slide` overlapping windows (Spark's `window(ts, len, slide)`
    * replicates rows into every covering window before the aggregation
    * — the state-store shape streaming needs; the same plan runs in
    * batch). Same exactness discipline as [[tumblingStats]]. Watermark
    * bounds streaming state to the windows still open. */
  def slidingStats(events: DataFrame, windowLen: String = "2 hours",
                   slide: String = "1 hour",
                   watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(w => events.withWatermark("ts", w)).getOrElse(events)
    src.groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Gap-based sessionization per user via the native `session_window`
    * operator (batch + streaming; Spark merges events closer than `gap`
    * into one window [first_ts, last_ts + gap)). */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   watermark: Option[String] = None): DataFrame = {
    val src = watermark.map(w => events.withWatermark("ts", w)).getOrElse(events)
    src.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("total_value"))
  }

  /** JSON props extraction — the lightweight event-payload parse
    * (`get_json_object`, codegen'd; no UDF). */
  def propsK(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("props_k"))

  /** Streaming exactly-once-per-key dedup with BOUNDED state: the
    * at-least-once→effectively-once repair every ingest pipeline needs.
    * `dropDuplicatesWithinWatermark` is the operator whose state the
    * watermark actually evicts — plain `dropDuplicates("event_id")`
    * under a watermark keeps one state row per id FOREVER (eviction
    * only applies when the event-time column is part of the key set),
    * which on a 100 TB/day stream grows the state store to OOM. The
    * within-watermark form drops replays arriving inside the watermark
    * delay and ages ids out afterwards; a replay older than the
    * watermark may pass — that is the explicit state-size/completeness
    * trade every bounded dedup makes. Batch input takes the exact
    * `dropDuplicates` (no state to bound). */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-stream interval join: each probe event joined to the same
    * user's earlier events within `intervalSecs` — the streaming form of
    * the range join (`q_join_range` is the batch-equivalence check of
    * this exact plan). On streaming input BOTH sides carry watermarks and
    * the join condition bounds event time on both sides, so Spark can
    * compute a state watermark and evict buffered rows — the state-bound
    * contract a 100 TB/day stream needs; unbounded stream-stream joins
    * are rejected by the analyzer. On batch input the same plan is a
    * plain inner join with the interval predicate. */
  def intervalJoin(probes: DataFrame, intervals: DataFrame,
                   intervalSecs: Long = 3600L,
                   watermark: String = "1 hour"): DataFrame = {
    def side(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val p = side(probes).select(col("event_id").as("event_id"),
      col("user_id").as("user_id"), col("ts").as("ts"))
    val i = side(intervals).select(col("event_id").as("interval_id"),
      col("user_id").as("i_user_id"), col("ts").as("i_ts"))
    p.join(i,
      col("user_id") === col("i_user_id") &&
        col("ts") > col("i_ts") &&
        col("ts") <= col("i_ts") + expr(s"INTERVAL $intervalSecs SECONDS"))
      .select(col("event_id"), col("interval_id"), col("user_id"))
  }

  /** The production streaming sink pattern: `foreachBatch` hands each
    * micro-batch to the BATCH sink layer (parquet here; the JDBC sink
    * composes the same way), so one sink implementation serves both
    * worlds and the stream gets batch-sink atomicity per micro-batch. */
  def sinkBatches(stream: DataFrame, path: String, queryName: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.io.Sinks.parquet(batch, s"$path/batch_$batchId")
      }
      .start()

  // ── custom state: mapGroupsWithState ───────────────────────────────

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class UserRunning(user_id: Long, n_events: Long, total_cents: Long)

  /** Per-user running totals with explicit keyed state — the
    * `mapGroupsWithState` pattern for semantics window operators can't
    * express (cross-batch accumulators). Cents are integer math so state
    * is exact regardless of arrival order. */
  def runningTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0L))
          var n = prev.n_events
          var cents = prev.total_cents
          batch.foreach { e =>
            n += 1
            cents += math.round(e.value * 100)
          }
          val next = UserRunning(user, n, cents)
          state.update(next)
          next
      }
  }

  /** Launch [[runningTotals]] as an update-mode stream into a memory
    * sink (test/dev harness for the stateful operator). */
  def runningTotalsQuery(events: DataFrame, queryName: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import events.sparkSession.implicits._
    runningTotals(events.as[Event]).writeStream
      .format("memory").queryName(queryName)
      .outputMode(OutputMode.Update()).start()
  }

  case class LastEvent(ts: java.sql.Timestamp, tie: Long, action: String)
  case class TransitionPair(from_action: String, to_action: String)

  /** Streaming form of [[graft.ops.Transitions.transitionMatrix]]'s pair
    * extraction: per-user keyed state holds only the LAST event, each
    * micro-batch sorts its per-user slice by (ts, event_id), chains it
    * after the stored last event, and emits every new consecutive pair —
    * append-mode output a downstream aggregation turns into live
    * transition counts. State is one row per user, O(keys) regardless
    * of history length.
    *
    * Ordering contract: within-user arrival must be non-decreasing in
    * event time ACROSS micro-batches (true for in-order log replay and
    * time-ordered file sources — the fixture's shape). Late events would
    * need watermark-delayed buffering; that variant is deliberately
    * absent — a late transition is a corrected HISTORY, which the batch
    * operator recomputes exactly. Batch ≡ stream under the contract
    * (StreamingSpec). */
  def streamingTransitions(events: Dataset[Event]): Dataset[TransitionPair] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, TransitionPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Event], state: GroupState[LastEvent]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val chained = state.getOption.map(l => (l.ts, l.tie, l.action)).toSeq ++
            sorted.map(e => (e.ts, e.event_id, e.event_type))
          val pairs = chained.sliding(2).collect {
            case Seq((_, _, a), (_, _, b)) => TransitionPair(a, b)
          }.toList
          sorted.lastOption.foreach(e =>
            state.update(LastEvent(e.ts, e.event_id, e.event_type)))
          pairs.iterator
      }
  }
}
