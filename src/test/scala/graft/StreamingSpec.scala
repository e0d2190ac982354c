package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {

  test("windowedAgg: watermark finalizes windows and drops late data") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp, Double)]
    val agg = StreamingIngest.windowedAgg(
      in.toDF().toDF("metric_id", "timestamp", "value"),
      granularity = "1 minute", watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("wagg")
      .outputMode("append").start()
    try {
      in.addData(("m", ts("2024-01-01 10:00:10"), 2.0),
        ("m", ts("2024-01-01 10:00:50"), 4.0))
      q.processAllAvailable()
      // advance watermark past 10:01 -> 10:00 window finalized
      in.addData(("m", ts("2024-01-01 10:10:00"), 6.0))
      q.processAllAvailable()
      // late beyond watermark: must be DROPPED (back-window analogue)
      in.addData(("m", ts("2024-01-01 10:00:30"), 100.0))
      q.processAllAvailable()
      // advance again to flush the 10:10 window
      in.addData(("m", ts("2024-01-01 10:20:00"), 8.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT bucket, mean, count FROM wagg ORDER BY bucket")
        .collect().map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
      assert(rows.contains((ts("2024-01-01 10:00:00"), 3.0, 2L))) // no late 100
      assert(rows.contains((ts("2024-01-01 10:10:00"), 6.0, 1L)))
    } finally q.stop()
  }

  test("boundedSeries state: reject-old, new-wins merge, emit-on-close") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    import StreamingIngest.Point
    val in = MemoryStream[Point]
    // block = 60 s, backWindow = 1 → window spans [floor(last,60)-60, ∞)
    val out = StreamingIngest.boundedSeries(in.toDS(), 60L, 1)
    val q = out.writeStream.format("memory").queryName("bound")
      .outputMode("append").start()
    def emitted() = s.sql("SELECT ts_ms, value FROM bound ORDER BY ts_ms")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    try {
      val t0 = ts("2024-01-01 10:00:00").getTime
      in.addData(Point("m", t0, 1.0), Point("m", t0 + 30_000, 2.0))
      q.processAllAvailable()
      assert(emitted().isEmpty) // everything still open
      // duplicate ts: NEW batch wins in the buffer (M1); too-old point
      // (< 09:59 after last=10:00:30) is rejected outright
      in.addData(Point("m", t0 + 30_000, 20.0), Point("m", t0 - 120_000, 9.9))
      q.processAllAvailable()
      assert(emitted().isEmpty)
      // advance two blocks: window floor moves to 10:01 → both 10:00
      // block points close and emit with the merged (new-wins) value
      in.addData(Point("m", t0 + 150_000, 3.0))
      q.processAllAvailable()
      assert(emitted() == Seq((t0, 1.0), (t0 + 30_000, 20.0)))
    } finally q.stop()
  }

  test("boundedSeries backfill burst: reject-old measures the OLD " +
      "buffer, not the batch's own max (carbonara.py:354-373)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    import StreamingIngest.Point
    val in = MemoryStream[Point]
    val out = StreamingIngest.boundedSeries(in.toDS(), 60L, 1)
    val q = out.writeStream.format("memory").queryName("bound_bf")
      .outputMode("append").start()
    def emitted() = s.sql("SELECT ts_ms, value FROM bound_bf ORDER BY ts_ms")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    try {
      val t0 = ts("2024-01-01 10:00:00").getTime
      // FIRST batch carries a whole hour of history in one burst: an
      // empty buffer accepts everything (the reference only slices
      // against first_block_timestamp when len(self.ts) != 0) and the
      // blocks that fall outside the advancing window close at once —
      // nothing silently vanishes
      val burst = (0 until 60).map(i => Point("m", t0 + i * 60_000L, i.toDouble))
      in.addData(burst: _*)
      q.processAllAvailable()
      // window = [floor(10:59,60s)-60s, inf) → last two blocks stay
      // open, the first 58 points emit as closed
      assert(emitted() ==
        (0 until 58).map(i => (t0 + i * 60_000L, i.toDouble)))
      // and a point inside the OLD buffer's window still lands even if
      // the same batch carries much newer points
      in.addData(Point("m", t0 + 58 * 60_000L + 30_000L, 99.0),
        Point("m", t0 + 62 * 60_000L, 100.0))
      q.processAllAvailable()
      assert(emitted().contains((t0 + 58 * 60_000L + 30_000L, 99.0)))
    } finally q.stop()
  }

  test("dedupBatch null-text content dedups across batches " +
      "(null-safe content key)") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-nulldd").toString
    val index = s"$root/index"; val kept = s"$root/kept"
    StreamingIngest.dedupBatch(
      Seq((1L, Option("alpha")), (2L, Option.empty[String]))
        .toDF("doc_id", "text"), 0L, index, kept)
    // re-delivery of the SAME null-text content in the next batch must
    // anti-join away (a null md5 key would survive every equi-join)
    StreamingIngest.dedupBatch(
      Seq((3L, Option.empty[String]), (4L, Option("beta")))
        .toDF("doc_id", "text"), 1L, index, kept)
    val kept1 = s.read.parquet(s"$kept/batch=1").select("doc_id")
      .as[Long].collect().toSet
    assert(kept1 == Set(4L))
  }

  test("dedupBatch replay: re-running a failed attempt's batch id is idempotent") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val index = s"$root/index"; val kept = s"$root/kept"
    def keptIds(batch: Long) =
      s.read.parquet(s"$kept/batch=$batch").select("doc_id")
        .as[Long].collect().toSet
    // batch 0: two distinct contents
    StreamingIngest.dedupBatch(
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"), 0L, index, kept)
    assert(keptIds(0) == Set(1L, 2L))
    // batch 1: one dup of batch 0, one new content
    val b1 = Seq((3L, "alpha"), (4L, "gamma")).toDF("doc_id", "text")
    StreamingIngest.dedupBatch(b1, 1L, index, kept)
    assert(keptIds(1) == Set(4L))
    // REPLAY batch 1 (checkpoint recovery re-delivers the same batch id
    // after index/batch=1 already exists): survivors must be identical,
    // not emptied by anti-joining against its own failed-attempt output
    StreamingIngest.dedupBatch(b1, 1L, index, kept)
    assert(keptIds(1) == Set(4L))
    // prior batches remain untouched and the index still dedups batch 2
    assert(keptIds(0) == Set(1L, 2L))
    StreamingIngest.dedupBatch(
      Seq((5L, "gamma"), (6L, "delta")).toDF("doc_id", "text"), 2L, index, kept)
    assert(keptIds(2) == Set(6L))
    // a RESET checkpoint (batch ids restart at 0 against the populated
    // index) must refuse loudly, not clobber the old run's survivors
    val e = intercept[IllegalArgumentException](StreamingIngest.dedupBatch(
      Seq((7L, "epsilon")).toDF("doc_id", "text"), 0L, index, kept))
    assert(e.getMessage.contains("checkpoint was reset"))
    assert(keptIds(0) == Set(1L, 2L)) // untouched
  }

  test("dedupBatch ownership marker: a foreign stream against an index " +
      "holding ONLY batch=0 refuses instead of clobbering (the max-id " +
      "guard is blind there — its one dir is the new batch's own name)") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-owner").toString
    val index = s"$root/index"; val kept = s"$root/kept"
    // old run: ONE batch, owned by checkpoint A
    StreamingIngest.dedupBatch(
      Seq((1L, "alpha")).toDF("doc_id", "text"), 0L, index, kept,
      ownerTag = Some(s"$root/ckptA"))
    // same checkpoint replaying its batch 0 is fine (idempotent)
    StreamingIngest.dedupBatch(
      Seq((1L, "alpha")).toDF("doc_id", "text"), 0L, index, kept,
      ownerTag = Some(s"$root/ckptA"))
    // a DIFFERENT stream (fresh checkpoint) starting at batch 0 must
    // refuse before any write
    val e = intercept[IllegalArgumentException](StreamingIngest.dedupBatch(
      Seq((9L, "omega")).toDF("doc_id", "text"), 0L, index, kept,
      ownerTag = Some(s"$root/ckptB")))
    assert(e.getMessage.contains("belongs to the stream checkpointed at"))
    assert(s.read.parquet(s"$kept/batch=0").select("doc_id")
      .as[Long].collect().toSet == Set(1L)) // survivors untouched
  }

  test("dedupBatch refuses a stray batch=backup=3 directory instead of " +
      "reading it as batch 3") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stray").toString
    val index = s"$root/index"; val kept = s"$root/kept"
    StreamingIngest.dedupBatch(
      Seq((1L, "alpha")).toDF("doc_id", "text"), 0L, index, kept)
    // an operator's copy of a batch dir
    new java.io.File(s"$index/batch=backup=3").mkdirs()
    val e = intercept[IllegalStateException](StreamingIngest.dedupBatch(
      Seq((2L, "beta")).toDF("doc_id", "text"), 1L, index, kept))
    assert(e.getMessage.contains("non-numeric batch"))
  }

  test("file-source stream drains micro-batches through the incremental job") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val staging = s"$root/staging"; val ckpt = s"$root/ckpt"
    new java.io.File(staging).mkdirs()
    val g = new graft.api.Graft(spark, root)
    val store = new graft.ingest.MetricStore(spark, s"$root/low",
      g.policies("low"))
    val q = StreamingIngest.start(spark, staging, ckpt, store)
    try {
      measures(("m", "2024-01-01 10:00:00", 1.0), ("m", "2024-01-01 10:00:30", 3.0))
        .write.mode("append").parquet(staging)
      q.processAllAvailable()
      val first = store.getMeasures("m", "mean", 300)
        .collect().map(r => (r.getTimestamp(1), r.getDouble(2))).toSet
      assert(first == Set((ts("2024-01-01 10:00:00"), 2.0)))
      // second micro-batch updates the same bucket through the job
      measures(("m", "2024-01-01 10:01:00", 8.0))
        .write.mode("append").parquet(staging)
      q.processAllAvailable()
      val second = store.getMeasures("m", "mean", 300)
        .collect().map(r => (r.getTimestamp(1), r.getDouble(2))).toSet
      assert(second == Set((ts("2024-01-01 10:00:00"), 4.0)))
    } finally q.stop()
  }

  test("sack-sharded drains: two workers split one staging stream by " +
      "sack ownership and commit in parallel against one store " +
      "(metricd hash-ring posture, cli/metricd.py:160-220)") {
    val root = java.nio.file.Files.createTempDirectory("graft-shard").toString
    val staging = s"$root/staging"
    new java.io.File(staging).mkdirs()
    val g = new graft.api.Graft(spark, root)
    val store0 = new graft.ingest.MetricStore(spark, s"$root/low",
      g.policies("low"))
    val store1 = new graft.ingest.MetricStore(spark, s"$root/low",
      g.policies("low"))
    // metrics across several sacks so both residue classes are hit
    val ms = (1 to 40).map("sh" + _)
    val byWorker = ms.groupBy(m =>
      Math.floorMod(graft.ingest.MetricStore.sackOfId(m), 2))
    assert(byWorker.keySet == Set(0, 1),
      "precondition: both workers own metrics")
    // zero lock waits: if the two drains ever contended on a sack
    // lock, one micro-batch would throw instead of queueing
    spark.conf.set("spark.graft.ingest.lockWaitMs", "0")
    val q0 = StreamingIngest.start(spark, staging, s"$root/ckpt0", store0,
      workerId = 0, workers = 2)
    val q1 = StreamingIngest.start(spark, staging, s"$root/ckpt1", store1,
      workerId = 1, workers = 2)
    try {
      measures(ms.map(m => (m, "2024-01-01 10:00:00", 1.0)): _*)
        .write.mode("append").parquet(staging)
      q0.processAllAvailable(); q1.processAllAvailable()
      measures(ms.map(m => (m, "2024-01-01 10:01:00", 3.0)): _*)
        .write.mode("append").parquet(staging)
      q0.processAllAvailable(); q1.processAllAvailable()
    } finally {
      q0.stop(); q1.stop()
      spark.conf.unset("spark.graft.ingest.lockWaitMs")
    }
    // every metric landed exactly once, through exactly one worker
    val reader = new graft.ingest.MetricStore(spark, s"$root/low",
      g.policies("low"))
    ms.foreach { m =>
      val got = reader.getMeasures(m, "mean", 300)
        .collect().map(r => (r.getTimestamp(1), r.getDouble(2))).toSet
      assert(got == Set((ts("2024-01-01 10:00:00"), 2.0)), s"metric $m: $got")
    }
  }
}
