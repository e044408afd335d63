package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximation-quality evaluation — the tuning instrument for the
  * sketch-backed families (LSH/IVF ANN, SimHash/MinHash near-dup):
  * every approximate operator here trades recall for scale through a
  * config knob (planes × tables, bands × rows, cells probed, hamming
  * radius), and choosing the knob for a corpus means MEASURING the
  * approximation against the exact form on a sample. These operators
  * make that measurement a first-class, engine-exact report instead of
  * a notebook one-off.
  *
  * Everything is counting — outputs are BIGINT counts and integer
  * basis points (`x · 10⁴ div denom`), NULL where the denominator is
  * empty; no doubles cross the edge.
  */
object Eval {

  /** Per-query recall of an approximate top-k against the exact top-k:
    * (query_id, n_exact, n_hits, recall_bp) with recall_bp =
    * n_hits·10⁴ div n_exact. Frames are (query, neighbor) shaped —
    * [[Similarity.bruteForceTopK]] vs [[Similarity.lshTopK]] /
    * [[Similarity.ivfTopK]] outputs, or any ranked retrieval pair.
    *
    * Scale posture: one equi-join + one keyed aggregation on frames
    * already bounded by queries·k rows — the cost lives in producing
    * the inputs, not here. Queries the approximate side missed
    * entirely still report (n_hits = 0) because the exact side drives
    * the join. */
  def recallAtK(exact: DataFrame, approx: DataFrame,
                queryCol: String, nnCol: String): DataFrame = {
    val e = exact.select(col(queryCol).as("query_id"), col(nnCol).as("nn_id"))
    val a = approx.select(col(queryCol).as("query_id"), col(nnCol).as("nn_id"))
      .withColumn("__hit", lit(1L))
    e.join(a, Seq("query_id", "nn_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum("__hit"), lit(0L)).as("n_hits"))
      .withColumn("recall_bp", expr("n_hits * 10000L div n_exact"))
  }

  /** One-row precision/recall/F1 of a predicted pair set against a
    * truth pair set (canonical `i < j` orientation on both sides, as
    * every `*Pairs` operator in [[Dedup]] emits): (n_truth, n_pred,
    * tp, fp, fn, precision_bp, recall_bp, f1_bp), the bp columns NULL
    * when their denominator is zero (no predictions / no truth).
    *
    * Scale posture: ONE full-outer join on the 8-byte pair keys + one
    * global aggregation of the marker columns — pair frames are the
    * small output of the dedup sweeps, and the single-partition
    * exchange above the global agg carries one partial row per task. */
  def pairConfusion(truth: DataFrame, predicted: DataFrame,
                    iCol: String, jCol: String): DataFrame = {
    val t = truth.select(col(iCol).as("i"), col(jCol).as("j"))
      .withColumn("__t", lit(1L))
    val p = predicted.select(col(iCol).as("i"), col(jCol).as("j"))
      .withColumn("__p", lit(1L))
    t.join(p, Seq("i", "j"), "full_outer")
      .agg(
        coalesce(sum(when(col("__t").isNotNull && col("__p").isNotNull, 1L)),
          lit(0L)).as("tp"),
        coalesce(sum(when(col("__t").isNull && col("__p").isNotNull, 1L)),
          lit(0L)).as("fp"),
        coalesce(sum(when(col("__t").isNotNull && col("__p").isNull, 1L)),
          lit(0L)).as("fn"))
      .select(
        (col("tp") + col("fn")).as("n_truth"),
        (col("tp") + col("fp")).as("n_pred"),
        col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0L, lit(null).cast("long"))
          .otherwise(expr("tp * 10000L div (tp + fp)")).as("precision_bp"),
        when(col("tp") + col("fn") === 0L, lit(null).cast("long"))
          .otherwise(expr("tp * 10000L div (tp + fn)")).as("recall_bp"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") === 0L,
          lit(null).cast("long"))
          .otherwise(expr("2L * tp * 10000L div (2L * tp + fp + fn)"))
          .as("f1_bp"))
  }
}
