package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column preprocessing for large-scale vector pipelines:
  * L2 normalization (so cosine becomes a plain dot product downstream)
  * and symmetric int8 quantization (4× storage/shuffle compression — the
  * standard trick before landing billions of vectors).
  *
  * Everything is pure `functions._` HOFs over `array<float>` — codegen'd,
  * no UDFs, and bit-deterministic: norms use the sequential-fold
  * [[Dedup.dot]], element math is double-widened then rounded back
  * exactly the way the DuckDB oracle replays it.
  */
object Embeddings {

  /** Let-binding for Column expressions: evaluates `bound` ONCE per row
    * and hands it to `body` as a lambda variable. Without this, a scalar
    * subexpression referenced inside a `transform` lambda is re-evaluated
    * per ELEMENT (plan-audited: the quantizer's abs-max scan ran 2·d
    * times per vector — O(d²) per row, 4× slower end-to-end). */
  private def bindOnce(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** v / ‖v‖ as `array<float>`; the all-zero vector stays all-zero. */
  def l2Normalize(vec: Column): Column =
    bindOnce(Dedup.l2norm(vec), nrm =>
      when(nrm === 0.0, vec).otherwise(
        transform(vec, x => (x.cast("double") / nrm).cast("float"))))

  /** Symmetric per-vector int8 quantization: scale = 127 / max|vᵢ|,
    * qᵢ = floor(vᵢ·scale + 0.5) — explicit floor(+0.5) rounding, defined
    * identically on every engine (no round-half-to-even ambiguity).
    * Returns a struct of (q `array<int>`, scale `double`); dequantize is
    * qᵢ / scale. All-zero vectors quantize to all-zero with scale 0. */
  def quantizeInt8(vec: Column): Column = {
    val absMax = array_max(transform(vec, x => abs(x.cast("double"))))
    val scale = when(absMax === 0.0, lit(0.0)).otherwise(lit(127.0) / absMax)
    bindOnce(scale, s =>
      struct(
        transform(vec, x =>
          floor(x.cast("double") * s + lit(0.5)).cast("int")).as("q"),
        s.as("scale")))
  }
}
