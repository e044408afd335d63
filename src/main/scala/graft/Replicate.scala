package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: writes a key-shifted `factor`× replica of the relational
  * (TPC-H-surface) tables so Bench can take a scale point beyond sf0.1
  * for the reference-surface queries (marts, reconcile, dup gate).
  *
  * Every replica shifts each table's join keys by `i · 10⁷` — far above
  * any sf0.1 key — and the SAME offset is applied to both sides of every
  * key space (l_suppkey and s_suppkey, o_custkey and c_custkey, …), so
  * per-replica joins keep their exact 1× fan-out and cross-replica joins
  * are impossible: join selectivity, dup density, and group counts scale
  * linearly, which is what makes the 1×-vs-N× timing ratio meaningful.
  * Non-key columns are copied verbatim. region/nation (pure dims) and
  * the corpus tables (events/documents/embeddings — their scaling table
  * was measured separately with replica-disjoint vocabularies) are
  * copied 1× so every suite query still runs against the output dir.
  *
  * Usage: runMain graft.Replicate <srcDir> <outDir> [factor=10]
  *        [corpusFactor=1] [corpusMode=verbatim|disjoint] [embFactor=1]
  *        [eventsFactor=1] [textRepeat=1]
  *
  * `textRepeat` > 1 makes every document `textRepeat`× LONGER (applied
  * after any corpus replication): the text becomes the concatenation of
  * `textRepeat` copies of itself with each copy's tokens suffixed by its
  * repetition index — token volume AND distinct-token-per-doc count grow
  * by the factor while document count is untouched. This is the
  * index-wins-crossover fixture (VERDICT r17 item 4): the DSIR/postings
  * parquet indexes break even at the driver fixture's 31-word docs
  * because the gram explode is cheap — long documents move the build
  * cost without moving the index-read cost (docs×buckets bounded), which
  * is the regime the index claims to win.
  *
  * `eventsFactor` > 1 replicates `events` with shifted event_ids AND
  * user_ids (ts/type/value/props verbatim): every replica is a disjoint
  * population living through the same time range, so per-user histories
  * — and with them session structure, transition pairs, and per-type
  * value distributions (medians, MADs, outlier flags) — are preserved
  * exactly within each replica while cross-replica interaction is
  * impossible. Sessionization/transition/outlier output scales linearly
  * in rows with CONSTANT per-key density, which is what makes the
  * 1×-vs-N× timing ratio meaningful for the behavioral family.
  *
  * `corpusFactor` > 1 additionally replicates `documents` with shifted
  * doc_ids (sources unchanged — per-source volume grows by the factor),
  * for scaling the composition/text scans whose semantics are per-row or
  * per-source. Verbatim mode is NOT suitable for the dedup-pair family:
  * verbatim text copies add cross-replica near-dup pairs (output grows
  * ~factor², density not constant). `corpusMode=disjoint` suffixes every
  * token with its replica index instead: token renaming is injective per
  * replica, so WITHIN-replica shingle sets — and therefore Jaccard
  * values, pair counts, and cluster structure — are exactly preserved,
  * while CROSS-replica shingle matches are impossible. Near-dup density
  * stays constant by construction, which is what makes the 1×-vs-N×
  * dedup timing ratio meaningful.
  *
  * `embFactor` > 1 replicates `embeddings` with shifted vec_ids; replica
  * 0 is verbatim and every later replica gets a per-replica
  * deterministic ±1 diagonal sign pattern on the vector coordinates
  * (sign of dimension d in replica i = parity of xxhash64(i·4099 + d)).
  * Both ends of any within-replica pair get the SAME diagonal D with
  * D² = I, so every WITHIN-replica dot product, norm, and (signed)
  * cosine is preserved bit-for-bit — per-replica near-dup structure and
  * density are unchanged. CROSS-replica cosines between
  * differently-signed replicas are suppressed, APPROXIMATELY: for the
  * same source vector in two replicas the cosine is a ±1-weighted sum
  * of squared coordinates (E ≈ 0, std ≈ 1/√dims ≈ 0.125 at 64 dims), so
  * at large factors a handful of the ~n·N²/2 same-source cross pairs
  * can land past a high threshold by tail probability — constant
  * density holds statistically, not by construction. Good enough for
  * timing-law replicas; do NOT use N× output as a correctness oracle
  * for pair COUNTS across replicas.
  */
object Replicate {

  private val ShiftStep = 10000000L // > every key in sf0.1 by ~16×

  private val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"))

  private val copyTables =
    Seq("region", "nation", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val corpusFactor = if (args.length > 3) args(3).toInt else 1
    val corpusMode = if (args.length > 4) args(4) else "verbatim"
    val embFactor = if (args.length > 5) args(5).toInt else 1
    val eventsFactor = if (args.length > 6) args(6).toInt else 1
    val textRepeat = if (args.length > 7) args(7).toInt else 1
    require(corpusMode == "verbatim" || corpusMode == "disjoint",
      s"corpusMode must be verbatim|disjoint, got $corpusMode")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for ((t, keys) <- shiftCols) {
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      val out = (0 until factor).map { i =>
        keys.foldLeft(df) { (d, k) => d.withColumn(k, col(k) + lit(i * ShiftStep)) }
      }.reduce(_ union _)
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[replicate] $t x$factor -> $outDir")
    }
    for (t <- copyTables) {
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      // long-document transform (applied AFTER replication below): text =
      // textRepeat suffixed copies of itself — empty tokens stay empty so
      // the tokenizer's filter still drops them
      def lengthen(d: org.apache.spark.sql.DataFrame) =
        if (t == "documents" && textRepeat > 1)
          d.withColumn("text", concat_ws(" ",
            flatten(transform(sequence(lit(0), lit(textRepeat - 1)), r =>
              transform(split(col("text"), " "), tk =>
                when(tk === "", tk).otherwise(concat(tk, lit("_t"), r)))))))
        else d
      val out = lengthen(
        if (t == "documents" && corpusFactor > 1)
          (0 until corpusFactor).map { i =>
            // replica 0 is emitted VERBATIM in both modes (ids unshifted,
            // text untouched) so the N× dataset is a strict superset of
            // the 1× fixture — fixed-id probe queries keep their meaning
            val shifted = df.withColumn("doc_id", col("doc_id") + lit(i * ShiftStep))
            if (corpusMode == "disjoint" && i > 0)
              shifted.withColumn("text", concat_ws(" ",
                transform(split(col("text"), " "), tk => concat(tk, lit(s"_r$i")))))
            else shifted
          }.reduce(_ union _)
        else if (t == "events" && eventsFactor > 1)
          (0 until eventsFactor).map { i =>
            // disjoint populations, same clock: replica 0 verbatim
            df.withColumn("event_id", col("event_id") + lit(i * ShiftStep))
              .withColumn("user_id", col("user_id") + lit(i * ShiftStep))
          }.reduce(_ union _)
        else if (t == "embeddings" && embFactor > 1)
          (0 until embFactor).map { i =>
            // mirror the documents path: replica 0 verbatim (previously
            // the sign diagonal also hit i=0 — xxhash64(d) parity is not
            // the identity — so the N× embeddings were NOT a superset of
            // the 1× fixture and constant-vector queries diverged)
            val shifted = df.withColumn("vec_id", col("vec_id") + lit(i * ShiftStep))
            if (i == 0) shifted
            else shifted.withColumn("embedding", transform(col("embedding"), (x, d) =>
              when(pmod(xxhash64(lit(i * 4099L) + d), lit(2)) === 0, x).otherwise(-x)
                .cast("float")))
          }.reduce(_ union _)
        else df)
      out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      val f = if (t == "documents") corpusFactor
              else if (t == "embeddings") embFactor
              else if (t == "events") eventsFactor else 1
      println(s"[replicate] $t x$f -> $outDir")
    }
    spark.stop()
  }
}
