package graft

import org.apache.spark.sql.functions._
import graft.functions.InterleaveBits
import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave: plain bit loop (what the spread-mask fast
    * path must equal). */
  private def slowInterleave(x: Long, y: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 31) {
      r |= ((x >> i) & 1L) << (2 * i)
      r |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  test("interleave matches the bit-loop reference, incl. edges") {
    val edges = Seq(0L, 1L, 2L, 3L, 255L, 256L, 0x7FFFFFFFL,
      0x80000000L /* masked */, Long.MaxValue /* masked */)
    val rnd = new scala.util.Random(42)
    val samples = edges ++ Seq.fill(200)(rnd.nextLong().abs)
    for (x <- samples; y <- samples.take(12)) {
      assert(InterleaveBits.interleave(x, y) == slowInterleave(x, y),
        s"mismatch at ($x, $y)")
      assert(InterleaveBits.interleave(x, y) >= 0L, s"sign bit at ($x, $y)")
    }
  }

  test("z-key expression equals the scala function through codegen") {
    val df = spark.range(1000).select(
      (col("id") * 37 % 1024).as("x"), (col("id") * 91 % 1024).as("y"))
    val got = df.select(col("x"), col("y"),
      Layout.zkey(col("x"), col("y")).as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == InterleaveBits.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("z-order layout prunes a 2-d box far better than a 1-d sort") {
    // 256x256 uniform grid, 16 output partitions either way.
    val grid = spark.range(65536).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))

    val z = Layout.zorder(grid, "x", "y", 16)
    val linear = grid.repartitionByRange(16, col("x"))

    // Box = the [0,63]^2 corner tile (1/16 of the data).
    val zCand = Layout.candidatePartitions(z, "x", "y", 0, 63, 0, 63)
    val xCand = Layout.candidatePartitions(linear, "x", "y", 0, 63, 0, 63)

    // z-curve: the corner tile is one compact z-range [0, 4096) — a
    // couple of partitions. The bound is deliberately loose (≤ 4):
    // repartitionByRange SAMPLES its boundaries with a seed derived from
    // the rdd id, so the exact split drifts with whatever ran earlier in
    // the JVM (observed 2-4 under different suite orders). 1-d sort:
    // every x-stripe covering x<=63 must be read (~4 of 16), each
    // spanning the full y range — the locality gap is the pinned
    // property, not a specific sample outcome.
    assert(zCand <= 4, s"z-order candidates: $zCand")
    assert(xCand >= 4, s"x-sorted candidates: $xCand")
    assert(zCand <= xCand, s"z-order ($zCand) vs x-sort ($xCand)")
  }

  test("zorder preserves row content exactly") {
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val before = grid.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val after = Layout.zorder(grid, "x", "y", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(after.sameElements(before))
  }

  test("partitionRanges reports one row per non-empty partition") {
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val ranges = Layout.partitionRanges(Layout.zorder(grid, "x", "y", 8),
      Seq("x", "y")).collect()
    assert(ranges.length == 8)
    assert(ranges.map(_.getAs[Long]("n_rows")).sum == 4096L)
  }

  test("compactFiles merges a small-files directory, preserving content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    val df = spark.range(10000).select(col("id"), (col("id") % 97).as("m"))
    df.repartition(40).write.parquet(in)

    val stats = Layout.compactFiles(spark, in, out, targetBytes = 1L << 30)
    assert(stats.filesBefore == 40)
    assert(stats.bytesBefore > 0)
    assert(stats.filesAfter == 1)

    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    assert(outFiles.length == 1)

    val before = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val after = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(after.sameElements(before))
  }

  test("compactFiles sizes the file count from input bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString
    val in = s"$dir/in"
    spark.range(20000).select(col("id"), md5(col("id").cast("string")).as("h"))
      .repartition(20).write.parquet(in)
    val p = new org.apache.hadoop.fs.Path(in)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val target = bytes / 4 + 1 // expect ~4 output files
    val stats = Layout.compactFiles(spark, in, s"$dir/out", target)
    assert(stats.filesAfter == ((bytes + target - 1) / target).toInt)
    assert(spark.read.parquet(s"$dir/out").count() == 20000L)
  }

  test("compactFiles refuses an in-place rewrite") {
    intercept[IllegalArgumentException] {
      Layout.compactFiles(spark, "/tmp/same-path", "/tmp/same-path")
    }
  }
}
