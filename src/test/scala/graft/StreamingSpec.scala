package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long = 1L, typ: String = "click",
                 v: Double = 1.0) = Event(id, ts(t), user, typ, v, "{\"k\": 1}")

  test("tumblingStats over a MemoryStream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.tumblingStats(mem.toDF(), "1 hour", Some("30 minutes"))
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(
        ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:55:00"),
        ev(3, "2024-01-01 11:10:00", typ = "view"))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select("window_start", "event_type", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 11:00:00"), "view", 1L)))
      // a second batch lands in an existing window
      mem.addData(ev(4, "2024-01-01 10:20:00"))
      q.processAllAvailable()
      val n = spark.table("tumbling_test")
        .filter($"event_type" === "click").select("n_events").first().getLong(0)
      assert(n == 3L)
    } finally q.stop()
  }

  test("slidingStats replicates each event into len/slide windows, batch == streaming") {
    val data = Seq(
      ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 11:10:00"),
      ev(3, "2024-01-01 11:40:00", typ = "view"))
    // batch: event at 10:05 covers windows starting 09:00 and 10:00
    val batch = EventStreams.slidingStats(data.toDF(), "2 hours", "1 hour")
      .select("window_start", "event_type", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(batch == Set(
      (ts("2024-01-01 09:00:00"), "click", 1L),
      (ts("2024-01-01 10:00:00"), "click", 2L),
      (ts("2024-01-01 11:00:00"), "click", 1L),
      (ts("2024-01-01 10:00:00"), "view", 1L),
      (ts("2024-01-01 11:00:00"), "view", 1L)))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.slidingStats(mem.toDF(), "2 hours", "1 hour",
      Some("30 minutes"))
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(data.take(2): _*); q.processAllAvailable()
      mem.addData(data.drop(2): _*); q.processAllAvailable()
      val streamed = spark.table("sliding_test")
        .select("window_start", "event_type", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionStats merges events within the gap, batch == streaming") {
    val data = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"),
      ev(3, "2024-01-01 10:41:00"), // 31 min after -> new session
      ev(4, "2024-01-01 09:00:00", user = 2L))
    // batch path
    val batch = EventStreams.sessionStats(data.toDF(), "30 minutes")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    assert(batch.toSeq == Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L),
      (1L, ts("2024-01-01 10:41:00"), 1L),
      (2L, ts("2024-01-01 09:00:00"), 1L)))
    // streaming path (complete mode over the same data)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionStats(mem.toDF(), "30 minutes", Some("1 hour"))
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      val stream = spark.table("session_test")
        .orderBy("user_id", "session_start").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      assert(stream.toSeq == batch.toSeq, "streaming must equal batch")
    } finally q.stop()
  }

  test("session boundary: exactly gap-late merges; beyond gap splits") {
    val merged = EventStreams.sessionStats(
      Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:30:00")).toDF(),
      "30 minutes").collect()
    assert(merged.length == 1, "event at exactly last+gap merges (inclusive)")
    val split = EventStreams.sessionStats(
      Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:30:01")).toDF(),
      "30 minutes").collect()
    assert(split.length == 2, "event beyond last+gap starts a new session")
  }

  test("runningTotals keeps per-user state across stream batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.runningTotalsQuery(mem.toDF(), "running_test")
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", v = 1.25),
        ev(2, "2024-01-01 10:01:00", v = 2.50))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 10:02:00", v = 0.25))
      q.processAllAvailable()
      // update mode: latest row per user wins
      val last = spark.table("running_test")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_cents").as("c"))
        .first()
      assert(last.getLong(1) == 3L)
      assert(last.getLong(2) == 400L) // 125 + 250 + 25 cents
    } finally q.stop()
  }

  test("streamingTransitions: pair counts equal the batch matrix across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.streamingTransitions(mem.toDS())
      .writeStream.format("memory").queryName("transitions_test")
      .outputMode(OutputMode.Append()).start()
    val all = Seq(
      ev(1, "2024-01-01 10:00:00", user = 1, typ = "a"),
      ev(2, "2024-01-01 10:01:00", user = 1, typ = "b"),
      ev(3, "2024-01-01 10:00:30", user = 2, typ = "b"),
      ev(4, "2024-01-01 10:02:00", user = 1, typ = "a"),
      ev(5, "2024-01-01 10:03:00", user = 2, typ = "a"),
      ev(6, "2024-01-01 10:04:00", user = 1, typ = "c"))
    try {
      // split mid-user-history: the cross-batch pair (b -> a for user 1)
      // only exists if keyed state carried the last event over
      mem.addData(all.take(3): _*)
      q.processAllAvailable()
      mem.addData(all.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("transitions_test")
        .groupBy("from_action", "to_action").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = graft.ops.Transitions
        .transitionMatrix(all.toDF(), "user_id", "ts", "event_type", "event_id")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n"))
        .toMap
      assert(got == want)
      assert(got(("b", "a")) == 2L) // one per user, one crossing the batch split
    } finally q.stop()
  }

  test("dedupEvents drops replayed ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupEvents(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      mem.addData(ev(1, "2024-01-01 10:02:00"), // replay of id 1
        ev(3, "2024-01-01 10:03:00"))
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), "replayed id must be dropped")
    } finally q.stop()
  }

  test("sinkBatches lands each micro-batch through the batch parquet sink") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_fb_").toString
    val mem = MemoryStream[Event]
    val q = EventStreams.sinkBatches(mem.toDF(), out, "fb_test")
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00")); q.processAllAvailable()
      mem.addData(ev(2, "2024-01-01 10:01:00")); q.processAllAvailable()
      val landed = spark.read.parquet(s"$out/batch_*").count()
      assert(landed == 2)
    } finally q.stop()
  }

  test("intervalJoin: stream-stream join equals batch, state bounded by watermark") {
    val data = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:30:00"),
      ev(3, "2024-01-01 11:30:00"),                 // > 1h after ev1, within 1h of ev2
      ev(4, "2024-01-01 10:10:00", user = 2L))      // other user, no partner
    val batch = EventStreams.intervalJoin(data.toDF(), data.toDF(), 3600L)
      .orderBy("event_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batch == Seq((2L, 1L), (3L, 2L)))
    // streaming path: both sides from one MemoryStream, append mode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val src = mem.toDF()
    val q = EventStreams.intervalJoin(src, src, 3600L, "2 hours")
      .writeStream.format("memory").queryName("interval_join_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // advance the watermark so buffered matches flush
      mem.addData(ev(99, "2024-01-01 20:00:00"))
      q.processAllAvailable()
      val stream = spark.table("interval_join_test")
        .filter($"event_id" =!= 99L && $"interval_id" =!= 99L)
        .orderBy("event_id", "interval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(stream == batch, "stream-stream interval join must equal batch")
    } finally q.stop()
  }

  test("stream-static dedup drops docs already in the static corpus") {
    val corpus = Seq((1L, "seen text one"), (2L, "seen text two"))
      .toDF("doc_id", "text")
    // batch contract
    val batchIn = Seq((10L, "seen text one"), (11L, "fresh text"))
      .toDF("doc_id", "text")
    val batch = graft.streaming.CorpusStreams
      .dedupAgainstCorpus(batchIn, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(batch == Seq(11L))
    // streaming path over the same data
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStreams
      .dedupAgainstCorpus(mem.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("corpus_dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((10L, "seen text one"), (11L, "fresh text"))
      q.processAllAvailable()
      mem.addData((12L, "seen text two"), (13L, "also fresh"))
      q.processAllAvailable()
      val ids = spark.table("corpus_dedup_test").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(11L, 13L), "corpus dups dropped in every micro-batch")
    } finally q.stop()
  }

  test("qualityGate filters a stream with the corpus-filter predicates") {
    val good = "the cat and the dog sat on the mat with the bird and " +
      "the fish for the day in the sun is it good for all of them to stay"
    val in = Seq((1L, good), (2L, "x"), (3L, good + " see https://spam.example"))
      .toDF("doc_id", "text")
    val out = graft.streaming.CorpusStreams.qualityGate(in)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L))
  }

  test("dedupAgainstEmbeddings gates micro-batches against the embedding index") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = e.filter($"vec_id" % 2 === 0)
    val idx = graft.ops.Dedup.buildEmbeddingIndex(corpus, "vec_id", "embedding",
      tables = 32, planes = 2)
    val incoming = e.filter($"vec_id" % 2 === 1)
    // batch contract: the gate applied to all incoming rows at once
    val expected = graft.streaming.CorpusStreams
      .dedupAgainstEmbeddings(incoming, idx, "vec_id", "embedding", 0.4)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(expected.size < incoming.count(), "fixture has cross-side near-dups")
    // streaming path: the same rows in two micro-batches through foreachBatch
    // (per the operator's contract — the anti join's right side derives from
    // the stream, so a direct streaming plan can't exist)
    implicit val sqlCtx = spark.sqlContext
    val rows = incoming.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (first, second) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.streaming.CorpusStreams
          .dedupAgainstEmbeddings(b, idx, "vec_id", "embedding", 0.4)
          .select("vec_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
      assert(got.sorted.toSeq == expected,
        "per-micro-batch gating equals the one-shot batch gate")
    } finally q.stop()
  }

  test("dedupAgainstPqIndex gates micro-batches against the PQ code table") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = e.filter($"vec_id" % 2 === 0)
    val idx = graft.ops.Similarity.buildPqIndex(corpus, "vec_id", "embedding",
      m = 4, codebookSize = 16, dims = 64)
    val incoming = e.filter($"vec_id" % 2 === 1).limit(40)
    // calibrate a threshold that splits the batch: the median nearest
    // ADC distance over the incoming rows
    val dists = graft.ops.Similarity
      .pqTopKIndexed(idx, incoming, "vec_id", "embedding", k = 1)
      .select("adist").collect().map(_.getDouble(0)).sorted
    val thr = dists(dists.length / 2)
    val expected = graft.streaming.CorpusStreams
      .dedupAgainstPqIndex(incoming, idx, "vec_id", "embedding", thr)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(expected.nonEmpty && expected.size < incoming.count(),
      "threshold must split the batch for the test to mean anything")
    implicit val sqlCtx = spark.sqlContext
    val rows = incoming.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (first, second) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.streaming.CorpusStreams
          .dedupAgainstPqIndex(b, idx, "vec_id", "embedding", thr)
          .select("vec_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
      assert(got.sorted.toSeq == expected,
        "per-micro-batch PQ gating equals the one-shot batch gate")
    } finally q.stop()
  }

  test("dedupAgainstIvfPqIndex: probed gate ≡ one-shot, catches appended copies") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = e.filter($"vec_id" < 400)
    val idx = graft.ops.Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding")
    val b1 = e.filter($"vec_id" >= 400 && $"vec_id" < 420)
    val appended = graft.ops.Similarity
      .appendToIvfPqIndex(idx, b1, "vec_id", "embedding")
    val b2 = b1.select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    // threshold = worst quantization error of the copies against the
    // appended index (copies' own code rows are the nearest candidates
    // in their probed cells — same cells, identical vectors)
    val th = graft.ops.Similarity
      .ivfPqTopKIndexed(appended, b2, "vec_id", "embedding", k = 1)
      .select("adist").collect().map(_.getDouble(0)).max
    val oneShot = graft.streaming.CorpusStreams
      .dedupAgainstIvfPqIndex(b2, appended, "vec_id", "embedding", th)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(oneShot.isEmpty, "copies of appended vectors must be caught")
    // two-micro-batch ≡ one-shot (stateless given a fixed index)
    implicit val sqlCtx = spark.sqlContext
    val rows = b2.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (first, second) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.streaming.CorpusStreams
          .dedupAgainstIvfPqIndex(b, appended, "vec_id", "embedding", th)
          .select("vec_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
      assert(got.sorted.toSeq == oneShot)
    } finally q.stop()
  }

  test("contaminationGate drops benchmark-quoting docs per micro-batch") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "alpha beta gamma delta epsilon and more"), // quotes the eval doc
      (2L, "totally unrelated words in this one here"),
      (3L, "alpha beta gamma but then it diverges"),   // below threshold
      (4L, "another clean document with fresh content"))
    // batch contract, bloom and exact agreeing
    val batchIn = incoming.toDF("doc_id", "text")
    val bloomBytes = graft.ops.Contamination
      .evalFilterBytes(eval, "doc_id", "text", 3)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val exact = ids(graft.streaming.CorpusStreams
      .contaminationGate(batchIn, eval, "doc_id", "text", 3, 0.5))
    assert(exact == Seq(2L, 3L, 4L), "only the quoting doc is dropped")
    assert(ids(graft.streaming.CorpusStreams.contaminationGate(
      batchIn, eval, "doc_id", "text", 3, 0.5, Some(bloomBytes))) == exact)
    // streaming path: two micro-batches through foreachBatch with the
    // sketch prebuilt ONCE (the stream-start contract)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.streaming.CorpusStreams
          .contaminationGate(b, eval, "doc_id", "text", 3, 0.5, Some(bloomBytes))
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      mem.addData(incoming.take(2): _*); q.processAllAvailable()
      mem.addData(incoming.drop(2): _*); q.processAllAvailable()
      assert(got.sorted.toSeq == exact,
        "per-micro-batch gating equals the one-shot batch gate")
    } finally q.stop()
  }

  test("passageGate drops stream docs quoting corpus passages per micro-batch") {
    import java.security.MessageDigest
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def anchoredGram(prefix: String): String =
      Iterator.from(0).map(i => f"$prefix$i%06d8".take(8))
        .find(g => md5hex(g).startsWith("0")).get
    val passage = anchoredGram("S") + ("stream-quoted-passage-" * 5).take(112)
    val corpus = Seq((100L, s"corpus doc carrying $passage inside"))
      .toDF("doc_id", "text")
    val idx = graft.ops.Dedup.buildPassageIndex(corpus, "doc_id", "text",
      window = 50)
    val incoming = Seq(
      (1L, s"intro then $passage then outro"),          // quotes the corpus
      (2L, "nothing shared with the corpus in this document at all here"),
      (3L, s"another quoting doc $passage differently placed"),
      (4L, "clean again completely fresh content for the fourth document"))
    // batch contract
    val batchIn = incoming.toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val expected = ids(graft.streaming.CorpusStreams
      .passageGate(batchIn, idx, "doc_id", "text"))
    assert(expected == Seq(2L, 4L), "quoting docs dropped")
    // streaming path through foreachBatch, two micro-batches
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.streaming.CorpusStreams
          .passageGate(b, idx, "doc_id", "text")
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      mem.addData(incoming.take(2): _*); q.processAllAvailable()
      mem.addData(incoming.drop(2): _*); q.processAllAvailable()
      assert(got.sorted.toSeq == expected,
        "per-micro-batch gating equals the one-shot batch gate")
    } finally q.stop()
  }

  test("file readStream over the fixture parquet reaches the same counts") {
    // FileStreamSource wants a directory: stage the fixture file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    implicit val sqlCtx = spark.sqlContext
    val stream = EventStreams.readStream(spark, dir)
    val q = EventStreams.tumblingStats(stream, "1 hour", Some("1 hour"))
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_test")
        .agg(sum("n_events")).first().getLong(0)
      val batch = spark.read.parquet(s"$sf/events.parquet").count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("driftMonitor: per-micro-batch KL equals the batch computation per batch") {
    val reference = graft.ops.Drift.tokenDistribution(
      Seq(("the cat sat"), ("the dog ran")).toDF("text"), "text")
    val b1 = Seq((1L, "the cat ran")); val b2 = Seq((2L, "der hund lief"))
    def batchRow(rows: Seq[(Long, String)]) =
      graft.streaming.CorpusStreams.driftMonitor(
        rows.toDF("doc_id", "text"), reference)
        .collect().head.toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty)
          got += graft.streaming.CorpusStreams.driftMonitor(b, reference)
            .collect().head.toSeq
        ()
      }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      assert(got.toSeq == Seq(batchRow(b1), batchRow(b2)))
      // the alien batch reads as drifted: more unseen mass, higher KL
      assert(got(1)(4).asInstanceOf[Double] > got(0)(4).asInstanceOf[Double])
    } finally q.stop()
  }

  test("classifierGate routes micro-batches exactly like the batch classifier") {
    val train = Seq(
      (1L, "en", "the cat and the dog"), (2L, "en", "the house of the king"),
      (3L, "de", "der hund und die katze"), (4L, "de", "das haus ist klein"))
      .toDF("doc_id", "lang", "text")
    val model = graft.ops.Classifier.nbTrain(train, "text", "lang")
    val incoming = Seq(
      (10L, "the king and the cat"), (11L, "der hund ist klein"),
      (12L, "die katze und der hund sind da"), (13L, "it is the dog"))
      .toDF("doc_id", "text")
    // batch contract: keep only docs routed to "en"
    val expected = graft.streaming.CorpusStreams
      .classifierGate(incoming, model, Seq("en"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(expected == Seq(10L, 13L), "fixture routes two docs to en")
    // streaming path: same rows in two micro-batches through foreachBatch
    // (per the operator's contract — the argmax groups on a stream key)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.streaming.CorpusStreams
          .classifierGate(b, model, Seq("en"), "doc_id")
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      mem.addData((10L, "the king and the cat"), (11L, "der hund ist klein"))
      q.processAllAvailable()
      mem.addData((12L, "die katze und der hund sind da"), (13L, "it is the dog"))
      q.processAllAvailable()
      assert(got.sorted.toSeq == expected,
        "per-micro-batch routing equals the one-shot batch gate")
    } finally q.stop()
    // classifyBatch attaches (predicted, score) shape-preservingly
    val labeled = graft.streaming.CorpusStreams
      .classifyBatch(incoming, model, "doc_id")
    assert(labeled.columns.toSet == Set("doc_id", "text", "predicted", "score"))
    assert(labeled.count() == 4)
  }

  test("privacyGate masks micro-batches against the persisted quasi index") {
    val corpus = Seq((1L, "en"), (2L, "en"), (3L, "en"), (4L, "de"), (5L, "de"))
      .toDF("doc_id", "lang")
    val idx = graft.ops.Privacy.buildQuasiIndex(corpus, Seq("lang"))
    def gateBatch(rows: Seq[(Long, String)]): Seq[(Long, Boolean)] =
      graft.streaming.CorpusStreams
        .privacyGate(rows.toDF("doc_id", "lang"), idx, "doc_id", Seq("lang"), 4L)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept"))
        .sortBy(_._1).toSeq
    val b1 = Seq((10L, "en"), (11L, "de")) // en: 3+1=4 kept; de: 2+1=3 masked
    val b2 = Seq((12L, "de"))              // de: 2+1=3 masked again
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Boolean)]]
    val q = mem.toDF().toDF("doc_id", "lang").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val out = graft.streaming.CorpusStreams
            .privacyGate(b, idx, "doc_id", Seq("lang"), 4L)
            .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept"))
          got += out.sortBy(_._1).toSeq
        }
        ()
      }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // per-micro-batch gating equals the batch contract per split
      assert(got.toSeq == Seq(gateBatch(b1), gateBatch(b2)))
      assert(got(0) == Seq(10L -> true, 11L -> false))
      assert(got(1) == Seq(12L -> false))
      // splitting is CONSERVATIVE: the one-shot union sees de at
      // 2 + 2 = 4 and keeps it — the split batches masked it instead
      assert(gateBatch(b1 ++ b2).toMap.apply(11L))
    } finally q.stop()
  }

  test("dsirGate admits target-like stream docs per micro-batch (batch ≡ stream)") {
    // target speaks {tq,uq,vq}; raw remainder speaks {xq,yq,zq}
    val corpus = Seq(
      (1L, "tq uq vq tq uq", "en"), (2L, "tq vq uq vq tq", "en"),
      (3L, "uq tq vq uq", "en"), (4L, "xq yq zq xq", "xx"),
      (5L, "yq zq xq yq zq", "xx"), (6L, "zq xq yq", "xx")
    ).toDF("doc_id", "text", "lang")
    val table = graft.ops.Selection.dsirFeatureTable(corpus, "doc_id", "text",
      col("lang") === "en", buckets = 256)
    val incoming = Seq(
      (10L, "tq uq vq tq"),   // target-like: admit
      (11L, "xq yq zq yq"),   // off-target: drop
      (12L, "uq vq tq uq vq"),
      (13L, "zq xq yq zq"))
    val batchIn = incoming.toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // the gate keeps dsir_bits on the admitted rows: read the actual
    // weights first (hash-bucket collisions shift absolute values, the
    // CONTRACT is the ordering) and derive a cut that splits the sets
    val w = graft.streaming.CorpusStreams
      .dsirGate(batchIn, table, "doc_id", "text", minBits = Long.MinValue)
      .select("doc_id", "dsir_bits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(10L) > w(11L) && w(10L) > w(13L) &&
      w(12L) > w(11L) && w(12L) > w(13L),
      s"target-like docs must outweigh off-target docs: $w")
    val cut = math.min(w(10L), w(12L))
    assert(cut > math.max(w(11L), w(13L)))
    val exact = ids(graft.streaming.CorpusStreams
      .dsirGate(batchIn, table, "doc_id", "text", minBits = cut))
    assert(exact == Seq(10L, 12L), s"target-like docs admitted: $exact")
    // streaming: same rows in two micro-batches, table built ONCE
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.streaming.CorpusStreams
          .dsirGate(b, table, "doc_id", "text", minBits = cut)
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }.start()
    try {
      mem.addData(incoming.take(2): _*); q.processAllAvailable()
      mem.addData(incoming.drop(2): _*); q.processAllAvailable()
      assert(got.sorted.toSeq == exact,
        "per-micro-batch gating equals the one-shot batch gate")
    } finally q.stop()
  }
}
