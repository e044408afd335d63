package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType,
  StringType}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomMightContain.mightContain

/** Bloom-filter join reduction — the classic distributed semi/anti join
  * optimization: build a compact membership sketch of the build side's
  * keys, ship it to every probe-side task, and let rows the filter
  * *definitely excludes* skip the shuffle entirely.
  *
  * Why this matters at 100 TB: a plain `left_anti`/`left_semi` join
  * shuffles the ENTIRE probe side on the join key even when almost
  * nothing matches. With the sketch applied at the scan:
  *
  *   - anti join: only rows the filter *might* contain (true matches +
  *     fpp of the rest) shuffle into the exact verify join; definite
  *     non-members — the overwhelming majority when the build side is
  *     selective — stream straight to the output with zero shuffle.
  *   - semi join: definite non-members drop at the scan; the exact join
  *     only sees candidate rows.
  *
  * Either way the shuffled volume falls from |probe| to
  * |matches| + fpp·|probe|, and the result is EXACTLY the plain join's —
  * a Bloom filter has no false negatives, and every "maybe" is verified
  * by a real join. (Spark's AQE can inject runtime bloom filters for some
  * shuffle joins — `spark.sql.optimizer.runtime.bloomFilter.enabled` —
  * but not for this pattern as a reusable, explicitly-sized primitive.)
  *
  * Building the filter runs one job eagerly at call time (a treeAggregate
  * of sketch bits — partial filters merge pairwise, the driver receives
  * one bit array of `expectedItems`-determined size, never rows — the
  * same driver protocol as [[Quantiles]]' histogram rounds). Size the
  * sketch honestly: `expectedItems` at or above the build side's true key
  * count keeps `fpp` honest; undersizing degrades fpp (more verify work)
  * but NEVER correctness.
  *
  * Null semantics match SQL joins exactly (see [[graft.functions.BloomMightContain]]):
  * null probe keys keep anti-join rows and drop semi-join rows; null
  * build keys are skipped (they can never equi-match).
  */
object BloomJoin {

  /** Serialized Bloom filter of `keyCol`'s non-null keys. Integral keys
    * insert as the widened long, strings as UTF-8 — the probe expression
    * mirrors both. */
  def buildFilter(df: DataFrame, keyCol: String, expectedItems: Long,
                  fpp: Double): Array[Byte] = {
    val dt = df.schema(keyCol).dataType
    val keyed = df.select(col(keyCol))
    val filter = dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        keyed.select(col(keyCol).cast("long")).rdd.treeAggregate(
          BloomFilter.create(expectedItems, fpp))(
          (f, row) => { if (!row.isNullAt(0)) f.putLong(row.getLong(0)); f },
          (a, b) => a.mergeInPlace(b))
      case StringType =>
        keyed.rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
          (f, row) => { if (!row.isNullAt(0)) f.putString(row.getString(0)); f },
          (a, b) => a.mergeInPlace(b))
      case other =>
        throw new IllegalArgumentException(s"bloom build on unsupported type $other")
    }
    val out = new ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }

  /** `left LEFT ANTI JOIN right ON leftKey = rightKey`, bloom-reduced:
    * definite non-members of the right key set bypass the join; only
    * might-contain rows are verified exactly. Result equals the plain
    * anti join row-for-row. */
  def bloomAntiJoin(left: DataFrame, right: DataFrame, leftKey: String,
                    rightKey: String, expectedItems: Long = 1000000L,
                    fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(right, rightKey, expectedItems, fpp)
    val inBloom = mightContain(col(leftKey), bytes)
    val rightKeys = right.select(col(rightKey).as("__bloom_rk"))
      .where(col("__bloom_rk").isNotNull)
    val verified = left.filter(inBloom)
      .join(rightKeys, col(leftKey) === col("__bloom_rk"), "left_anti")
    left.filter(!inBloom).unionByName(verified)
  }

  /** `left LEFT SEMI JOIN right ON leftKey = rightKey`, bloom-reduced:
    * definite non-members drop at the probe scan; candidates are
    * verified exactly. Result equals the plain semi join row-for-row. */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, leftKey: String,
                    rightKey: String, expectedItems: Long = 1000000L,
                    fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(right, rightKey, expectedItems, fpp)
    val rightKeys = right.select(col(rightKey).as("__bloom_rk"))
      .where(col("__bloom_rk").isNotNull)
    left.filter(mightContain(col(leftKey), bytes))
      .join(rightKeys, col(leftKey) === col("__bloom_rk"), "left_semi")
  }
}
