package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Backs: the SCALE.md r17 row for Eval.ivfPqAppendDrift — the retrain
  * trigger instrument must itself run at corpus scale, since a production
  * owner re-evaluates recall after every append wave. Builds on half the
  * 100x embedding replica (100k vectors), appends the other half in two
  * 50k batches (IID and orthant-drifted arms), and reports both curves
  * plus wall time.
  *
  * Usage: Test/runMain graft.tools.DriftScaleProbe [dir]
  */
object DriftScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/replica100"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    // replica ids are base + replicaIndex * 10M (graft.Replicate) — cut
    // by replica index, not raw id range
    val Stride = 10000000L
    val half = 50L * Stride
    val q3 = 75L * Stride
    println(s"corpus $n vectors; build on replicas 0-49, append 50-74 + 75-99")
    val build = emb.filter(col("vec_id") < half)
    val b1 = emb.filter(col("vec_id") >= half && col("vec_id") < q3)
    val b2 = emb.filter(col("vec_id") >= q3)
    def drifted(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), transform(col("embedding"), x => abs(x)).as("embedding"))
    // abs() KILLS the replica sign-diagonals, so at this replica all 50
    // drifted replicas become identical vector sets — ground truth
    // degenerates to 49-fold exact duplicates and post-retrain ADC ties
    // flood the shortlist with same-code low-id vectors (measured: the
    // retrain rows on the abs arm read 0 bp — a dedup-before-indexing
    // lesson, not a recall law). The SHIFT drift pushes every appended
    // vector into the coord-0 > 1 half-space while leaving the other 63
    // sign-diagonal coords intact: a genuine distribution shift with NO
    // duplicate degeneracy.
    def shiftDrifted(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), transform(col("embedding"), (x, i) =>
        when(i === 0, x + lit(1.0f)).otherwise(x).cast("float")).as("embedding"))
    val qIid = emb.filter(col("vec_id") >= half && col("vec_id") < half + 8)
    require(qIid.count() == 8, "query slice must be 8 vectors")
    // three arms: the toy operating point (m=4, 16 codewords = 16-bit
    // codes — saturates at 200k vectors), the same under drift, and a
    // CORPUS-SIZED config (m=8, 64 codewords = 48-bit codes, kPrime=250)
    // showing recall is a config property, not an append property
    for ((label, batches, qs, m, cb, kP) <- Seq(
        ("iid      m4/16 ", Seq(b1, b2), qIid, 4, 16, 40),
        ("drift    m4/16 ", Seq(drifted(b1), drifted(b2)), drifted(qIid), 4, 16, 40),
        ("iid      m8/64 ", Seq(b1, b2), qIid, 8, 64, 250))) {
      val t0 = System.nanoTime()
      val rows = graft.ops.Eval.ivfPqAppendDrift(build, batches, qs,
        "vec_id", "embedding", kPrime = kP, m = m, codebookSize = cb)
        .orderBy("step").collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: ${sec}%.1f s  " + rows.map(r =>
        s"(step=${r.getInt(0)} n=${r.getLong(1)} adc=${r.getLong(2)}bp " +
          s"refined=${r.getLong(3)}bp)").mkString(" "))
    }

    // retrain arms (r18, VERDICT r17 item 2): the RESPONSE measured at
    // the same 200k scale — (a) the drifted arm retrained at the toy
    // config (re-seeding alone: fixes the probe miss, not the 16-bit
    // quantization floor), (b) the SATURATED-config arm retrained at the
    // corpus-sized m=8/64 (re-sizing: the retrain that actually recovers
    // ADC recall at scale)
    for ((label, batches, qs, m, cb, kP, rm, rcb, rkP) <- Seq(
        ("retrain  drift m4/16->m4/16 ",
          Seq(drifted(b1), drifted(b2)), drifted(qIid), 4, 16, 40, 4, 16, 40),
        ("retrain  drift m4/16->m8/64 ",
          Seq(drifted(b1), drifted(b2)), drifted(qIid), 4, 16, 40, 8, 64, 250),
        ("retrain  shift m4/16->m4/16 ",
          Seq(shiftDrifted(b1), shiftDrifted(b2)), shiftDrifted(qIid),
          4, 16, 40, 4, 16, 40),
        ("retrain  shift m4/16->m8/64 ",
          Seq(shiftDrifted(b1), shiftDrifted(b2)), shiftDrifted(qIid),
          4, 16, 40, 8, 64, 250),
        ("retrain  iid   m4/16->m8/64 ",
          Seq(b1, b2), qIid, 4, 16, 40, 8, 64, 250))) {
      val t0 = System.nanoTime()
      val rows = graft.ops.Eval.ivfPqRetrainRecovery(build, batches, qs,
        "vec_id", "embedding", kPrime = kP, m = m, codebookSize = cb,
        retrainM = rm, retrainCodebookSize = rcb, retrainKPrime = rkP)
        .orderBy("step").collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: ${sec}%.1f s  " + rows.map(r =>
        s"(${r.getString(1)} n=${r.getLong(2)} adc=${r.getLong(3)}bp " +
          s"refined=${r.getLong(4)}bp)").mkString(" "))
    }
    spark.stop()
  }
}
