package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Distributed global ranking — the scalable form of
  * `percent_rank() OVER (ORDER BY v)` (no partition clause), which Spark
  * plans as a SINGLE-partition window: every row funnels through one task,
  * the classic 100 TB scale-killer (SURVEY.md §4 anti-pattern 3, mandated
  * by the reference's customer mart
  * `m_customer_sales_report_task.py:106-122`).
  *
  * The key observation: RANK (and therefore percent_rank = (rank-1)/(n-1))
  * depends only on the row's VALUE — every tie shares the rank of the
  * first row of its run. So rank the DISTINCT values instead of the rows:
  *
  *   1. `groupBy(value).count()` — one map-side-combined shuffle; output
  *      is (value, cnt), two columns regardless of input width.
  *   2. `repartitionByRange(value).sortWithinPartitions` — a range
  *      shuffle of the compact frame; equal values collapse into one row
  *      in step 1, so a run of ties can never straddle a partition
  *      boundary (the failure mode of naive rank-with-offset schemes).
  *   3. One tiny job collects the P per-partition row counts; cumulative
  *      offsets make every partition's local running sum globally
  *      correct: rank(v) = rows-strictly-before(v) + 1. The second pass
  *      reuses the range shuffle's map output (same RDD lineage — Spark
  *      stage reuse), so the compact frame is not recomputed from source.
  *   4. Equi-join (null-safe) the (value, percent_rank) frame back.
  *
  * Shuffled volume is 2×|distinct values| compact rows plus the join —
  * never a single-partition exchange. The computed value is BIT-IDENTICAL
  * to Spark's `percent_rank` window: same rank definition, same
  * `(rank-1)/(n-1)` double division (0.0 when n ≤ 1), same null ordering
  * (nulls last under DESC, first under ASC — Spark's window defaults).
  *
  * The input is scanned twice (once feeding the count shuffle, once as
  * the join probe) — callers ranking an expensive lineage should persist
  * it first, exactly like any multi-consumer diamond.
  *
  * EAGER + SNAPSHOT semantics, by design: step 3's offset protocol runs
  * two Spark jobs AT CONSTRUCTION time (this is a rank computation, not a
  * free plan transform), and the offsets are a snapshot of the input as
  * of that moment. The join probe re-reads the input lazily at action
  * time, so the input must be stable between construction and action —
  * the batch contract everywhere in this engine (deterministic fixture
  * reads; persist the input first if its lineage is not re-runnable).
  * Values absent from the snapshot would surface as NULL `outCol` via the
  * left join rather than a wrong rank.
  */
object Ranks {

  /** Append `outCol` = global percent_rank of `valueCol` (descending by
    * default, matching "top fraction" tiering semantics). */
  def globalPercentRank(df: DataFrame, valueCol: String,
                        descending: Boolean = true,
                        outCol: String = "percent_rank"): DataFrame = {
    val spark = df.sparkSession
    val compact = df.groupBy(col(valueCol).as("__rank_v"))
      .agg(count(lit(1)).as("__rank_cnt"))
    val sortKey = if (descending) col("__rank_v").desc else col("__rank_v").asc
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = compact.repartitionByRange(parts, sortKey)
      .sortWithinPartitions(sortKey)

    val rdd = ranged.rdd // (value, cnt) rows — compact by construction
    // job 1: per-partition row totals (P longs to the driver — a bounded
    // protocol, not row data)
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(s += _.getLong(1)); Iterator.single(pid -> s)
    }.collect().sortBy(_._1).map(_._2)
    val n = totals.sum
    val offsets = totals.scanLeft(0L)(_ + _) // rows before partition pid
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    // job 2 (lazy, shuffle-reused): running sum + partition offset gives
    // each distinct value its exact global rank
    val ranksRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var before = bcOffsets.value(pid)
      it.map { r =>
        val rank = before + 1L
        val pr = if (n <= 1L) 0.0 else (rank - 1L).toDouble / (n - 1L).toDouble
        before += r.getLong(1)
        Row(r.get(0), pr)
      }
    }
    val ranks = spark.createDataFrame(ranksRdd, StructType(Seq(
      df.schema(valueCol).copy(name = "__rank_v"),
      StructField(outCol, DoubleType, nullable = false))))
    df.join(ranks, col(valueCol) <=> col("__rank_v"), "left").drop("__rank_v")
  }
}
