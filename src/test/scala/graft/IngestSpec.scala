package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.MetricStore
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}

/** Incremental-aggregation-job behaviors from test_storage.py /
  * test_chef.py: late data within the back window, new-wins rewrite,
  * incremental == full recompute, retention expiry.
  */
class IngestSpec extends SparkSpec {

  private def newStore(backWindow: Int = 0,
                       methods: Set[String] = Set("mean", "sum", "count")) = {
    val dir = Files.createTempDirectory("graft-store").toString
    val policy = ArchivePolicy("test", backWindow,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      methods)
    new MetricStore(spark, dir, policy)
  }

  test("read order is truncate -> resample -> fetch at the OUTPUT " +
      "granularity (storage/__init__.py:294-338): a start inside a " +
      "coarse bucket returns the FULL-bucket value, not a partial mean") {
    val dir = Files.createTempDirectory("graft-order").toString
    val policy = ArchivePolicy("test", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean"))
    val store = new MetricStore(spark, dir, policy)
    // four fine buckets inside ONE 240s coarse bucket: 1, 2, 3, 4
    store.addMeasures(measures(
      ("m", "2014-01-01 12:00:10", 1.0), ("m", "2014-01-01 12:01:10", 2.0),
      ("m", "2014-01-01 12:02:10", 3.0), ("m", "2014-01-01 12:03:10", 4.0)))
    val got = store.getMeasures("m", "mean", 60,
        from = Some(ts("2014-01-01 12:02:00")),
        resample = Some(Granularity.seconds(240)))
      .collect().map(r => (r.getTimestamp(1).toString, r.getDouble(2))).toSeq
    // the reference resamples the whole pruned range THEN fetches with
    // `from` floored to the 240s output granularity: mean(1,2,3,4)=2.5.
    // Fetching fine-first would hand resample only (3,4) → 3.5.
    assert(got == Seq(("2014-01-01 12:00:00.0", 2.5)))
  }

  test("store lock: a second SAME-SACK writer fails loudly (after the " +
      "wait deadline) and the holder's in-flight staging survives " +
      "(tooz sack locks, chef.py:426-431, made mechanical)") {
    val dir = Files.createTempDirectory("graft-lock").toString
    val policy = ArchivePolicy("test", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean"))
    val store = new MetricStore(spark, dir, policy)
    store.addMeasures(measures(("m", "2014-01-01 12:00:01", 1.0)))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val mSack = MetricStore.sackOfId("m")
    val mLock = new org.apache.hadoop.fs.Path(s"$dir/.lock.sack.$mSack")
    // normal lifecycle (default staleness): the batch released its locks
    assert(Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$dir/.lock.sack.*")))
      .forall(_.isEmpty), "sack locks not released after a batch")
    // simulate a LIVE concurrent writer on m's sack: its lock is held
    // and it has in-flight staging under the agg plane
    fs.create(mLock, false).close()
    val winners = new org.apache.hadoop.fs.Path(s"$dir/agg/.staging-winner")
    fs.mkdirs(winners)
    // no wait so the loss is immediate (the waiting posture has its
    // own arm below)
    spark.conf.set("spark.graft.ingest.lockWaitMs", "0")
    val e =
      try intercept[IllegalStateException](
        store.addMeasures(measures(("m", "2014-01-01 12:00:02", 2.0))))
      finally spark.conf.unset("spark.graft.ingest.lockWaitMs")
    assert(e.getMessage.contains("locked by another writer"))
    assert(fs.exists(winners), "loser swept the live writer's staging")
    // the loser must not have mutated the store either
    assert(store.getMeasures("m", "mean", 60)
      .collect().map(_.getDouble(2)).toSeq == Seq(1.0))
    // a CRASHED writer's lock (older than the staleness threshold) is
    // broken and the batch proceeds; the (age-gated) sweep then clears
    // its staging — under lockStaleMs=0 everything is instantly stale
    spark.conf.set("spark.graft.ingest.lockStaleMs", "0")
    try store.addMeasures(measures(("m", "2014-01-01 12:00:03", 5.0)))
    finally spark.conf.unset("spark.graft.ingest.lockStaleMs")
    assert(store.getMeasures("m", "mean", 60)
      .collect().map(_.getDouble(2)).toSeq == Seq(3.0)) // mean(1,5)
    assert(!fs.exists(winners), "stale staging not swept after lock break")
    // under lockStaleMs=0 every hold is instantly over-stale, so
    // release deliberately LEAVES the lock rather than race a possible
    // successor's break (check-then-delete is only race-free when no
    // breaker may act); the leak self-heals via the next writer's
    // stale break — prove it by running one more batch
    assert(fs.exists(mLock),
      "over-stale hold should leave the lock for the successor's break")
    spark.conf.set("spark.graft.ingest.lockStaleMs", "0")
    try store.addMeasures(measures(("m", "2014-01-01 12:00:04", 6.0)))
    finally spark.conf.unset("spark.graft.ingest.lockStaleMs")
    assert(store.getMeasures("m", "mean", 60)
      .collect().map(_.getDouble(2)).toSeq == Seq(4.0)) // mean(1,5,6)
  }

  test("sack-lock protocol edges: maintenance breaks MULTIPLE stale " +
      "locks in one pass; a failed multi-sack acquisition releases " +
      "what it already held") {
    val dir = Files.createTempDirectory("graft-lockedge").toString
    val policy = ArchivePolicy("le", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean"))
    val store = new MetricStore(spark, dir, policy)
    store.addMeasures(measures(("m", "2014-01-01 12:00:01", 1.0)))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // two crashed writers' stale locks on different sacks: an all-sack
    // maintenance op must break BOTH and complete under the default
    // staleness threshold
    for (s <- Seq(3, 17)) {
      val p = s"$dir/.lock.sack.$s"
      fs.create(new org.apache.hadoop.fs.Path(p), false).close()
      new java.io.File(p).setLastModified(
        System.currentTimeMillis() - 2 * 3600 * 1000L)
    }
    store.compact() // takes all 32 sacks
    assert(Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$dir/.lock.sack.*")))
      .forall(_.isEmpty), "stale locks not broken+released by compact")
    // partial-release: a two-sack batch that loses the SECOND lock
    // must free the first before failing — otherwise it leaks a lock
    // that blocks every later writer on that sack
    val mA = "m"
    val sackA = MetricStore.sackOfId(mA)
    val mB = (1 to 1000).map("q" + _)
      .find(m => MetricStore.sackOfId(m) > sackA).getOrElse(
        fail("no metric with a higher sack than m"))
    val lockB = new org.apache.hadoop.fs.Path(
      s"$dir/.lock.sack.${MetricStore.sackOfId(mB)}")
    fs.create(lockB, false).close() // live holder on the higher sack
    spark.conf.set("spark.graft.ingest.lockWaitMs", "0")
    try intercept[IllegalStateException](store.addMeasures(measures(
      (mA, "2014-01-01 12:00:02", 2.0), (mB, "2014-01-01 12:00:02", 3.0))))
    finally spark.conf.unset("spark.graft.ingest.lockWaitMs")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/.lock.sack.$sackA")),
      "failed acquisition leaked the already-held lower sack lock")
    fs.delete(lockB, false)
    // the store still works afterwards
    store.addMeasures(measures((mA, "2014-01-01 12:00:31", 5.0)))
    assert(store.getMeasures(mA, "mean", 60)
      .collect().map(_.getDouble(2)).toSeq == Seq(3.0)) // mean(1,5)
  }

  test("per-sack locks: a DISJOINT-sack batch proceeds while another " +
      "sack's lock is held; a SAME-sack batch waits the holder out " +
      "(metricd fleet posture, cli/metricd.py:160-220)") {
    val dir = Files.createTempDirectory("graft-sacklock").toString
    val policy = ArchivePolicy("test", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean"))
    val store = new MetricStore(spark, dir, policy)
    // two metric names in different sacks (deterministic xxhash map)
    val mA = "m"
    val mB = (1 to 1000).map("b" + _)
      .find(MetricStore.sackOfId(_) != MetricStore.sackOfId(mA)).get
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val lockB = new org.apache.hadoop.fs.Path(
      s"$dir/.lock.sack.${MetricStore.sackOfId(mB)}")
    fs.mkdirs(lockB.getParent)
    fs.create(lockB, false).close()
    // (a) disjoint: mA's batch must NOT wait on mB's held lock — with
    // lockWaitMs=0 any contention would throw, so success here IS the
    // concurrency proof
    spark.conf.set("spark.graft.ingest.lockWaitMs", "0")
    try store.addMeasures(measures((mA, "2014-01-01 12:00:01", 1.0)))
    finally spark.conf.unset("spark.graft.ingest.lockWaitMs")
    assert(store.getMeasures(mA, "mean", 60)
      .collect().map(_.getDouble(2)).toSeq == Seq(1.0))
    // (b) same sack: a writer on mB WAITS until the holder releases,
    // then commits — serialization, not failure
    spark.conf.set("spark.graft.ingest.lockWaitMs", "30000")
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var failure: Option[Throwable] = None
    val t = new Thread(() => {
      try store.addMeasures(measures((mB, "2014-01-01 12:00:01", 2.0)))
      catch { case e: Throwable => failure = Some(e) }
      finally done.countDown()
    })
    try {
      t.start()
      Thread.sleep(1500) // let the writer reach the lock wait
      assert(done.getCount == 1, "same-sack writer did not wait")
      fs.delete(lockB, false) // holder releases
      assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "waiting writer never finished after the lock was released")
      failure.foreach(throw _)
    } finally {
      spark.conf.unset("spark.graft.ingest.lockWaitMs")
      t.join(60000)
    }
    assert(store.getMeasures(mB, "mean", 60)
      .collect().map(_.getDouble(2)).toSeq == Seq(2.0))
  }

  test("FUZZ two concurrent writers on DISJOINT sacks == sequential " +
      "ingest, with zero lock waits (concurrent-ingest scale-out)") {
    // Two MetricStore facades over the SAME root ingest interleaved
    // batches for metric sets living in disjoint sacks, from two
    // threads, with lockWaitMs=0 — so ANY lock contention, staging
    // sweep of a live writer, or listing race fails the run loudly.
    // The final store bytes must equal a sequential single-writer
    // ingest of the same points (the incremental==full contract,
    // storage/__init__.py:643-668, under interleaving).
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(151515L))
    val baseS = ts("2014-01-01 00:00:00").getTime / 1000
    val policy = ArchivePolicy("cw", 1000000,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean", "sum", "count", "rate:sum"))
    val s = spark
    import s.implicits._
    def df(rows: Seq[(String, Long, Double)]) =
      rows.map { case (m, t, v) =>
        (m, new java.sql.Timestamp(t * 1000), v) }
        .toDF("metric_id", "timestamp", "value")
    for (round <- 0 until 2) {
      val dir = Files.createTempDirectory("graft-conc").toString
      // metric names for writer A and writer B, disjoint sack sets
      val sackOfA = MetricStore.sackOfId("a1")
      val as = (1 to 400).map("a" + _)
        .filter(MetricStore.sackOfId(_) == sackOfA).take(3)
      val bs = (1 to 400).map("b" + _)
        .filter(m => MetricStore.sackOfId(m) != sackOfA).take(3)
      def pts(ms: Seq[String]) = (for {
        m <- ms; _ <- 0 until (15 + rnd.nextInt(20))
      } yield (m, baseS + rnd.nextInt(86400 / 30) * 30L,
        math.round(rnd.nextDouble() * 1000) / 10.0))
        .groupBy(p => (p._1, p._2)).map(_._2.head).toVector
      val (ptsA, ptsB) = (pts(as), pts(bs))
      def batchesOf(p: Vector[(String, Long, Double)]) = {
        val sh = rnd.shuffle(p); val nb = 2 + rnd.nextInt(2)
        sh.zipWithIndex.groupMap(_._2 % nb)(_._1).toSeq.sortBy(_._1)
          .map(_._2)
      }
      val (batchesA, batchesB) = (batchesOf(ptsA), batchesOf(ptsB))
      spark.conf.set("spark.graft.ingest.lockWaitMs", "0")
      val start = new java.util.concurrent.CyclicBarrier(2)
      @volatile var failure: Option[Throwable] = None
      def writer(batches: Seq[Seq[(String, Long, Double)]]) =
        new Thread(() => {
          try {
            val st = new MetricStore(spark, dir, policy)
            start.await()
            batches.foreach(b => st.addMeasures(df(b)))
          } catch { case e: Throwable => failure = Some(e) }
        })
      val (tA, tB) = (writer(batchesA), writer(batchesB))
      try {
        tA.start(); tB.start(); tA.join(300000); tB.join(300000)
      } finally spark.conf.unset("spark.graft.ingest.lockWaitMs")
      failure.foreach(throw _)
      val seq = new MetricStore(spark,
        Files.createTempDirectory("graft-conc-seq").toString, policy)
      seq.addMeasures(df(ptsA ++ ptsB))
      def dump(x: MetricStore) = x.aggregates
        .select("metric_id", "method", "gran_s", "bucket", "value")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getAs[Number](2).longValue(),
          r.getTimestamp(3).toString, r.getDouble(4))).toSet
      val conc = dump(new MetricStore(spark, dir, policy))
      val sq = dump(seq)
      assert(conc == sq, s"round $round: conc-only=${(conc -- sq).take(5)} " +
        s"seq-only=${(sq -- conc).take(5)}")
    }

    // SAME-sack contention arm: two writers over one metric set (one
    // sack), waiting enabled — both must succeed (queueing behind the
    // holder, never failing, never interleaving a batch), and the
    // result must equal sequential ingest (timestamps unique, so batch
    // order cannot matter)
    val dir2 = Files.createTempDirectory("graft-conc-same").toString
    val sameSack = MetricStore.sackOfId("s1")
    val sm = ("s1" +: (1 to 400).map("s" + _))
      .filter(MetricStore.sackOfId(_) == sameSack).take(3)
    val ptsS = (for {
      m <- sm; _ <- 0 until 25
    } yield (m, baseS + rnd.nextInt(86400 / 30) * 30L,
      math.round(rnd.nextDouble() * 1000) / 10.0))
      .groupBy(p => (p._1, p._2)).map(_._2.head).toVector
    val half = rnd.shuffle(ptsS).splitAt(ptsS.size / 2)
    spark.conf.set("spark.graft.ingest.lockWaitMs", "120000")
    val start2 = new java.util.concurrent.CyclicBarrier(2)
    @volatile var failure2: Option[Throwable] = None
    def writer2(points: Vector[(String, Long, Double)]) = new Thread(() => {
      try {
        val st = new MetricStore(spark, dir2, policy)
        start2.await()
        points.grouped(math.max(1, points.size / 2))
          .foreach(b => st.addMeasures(df(b)))
      } catch { case e: Throwable => failure2 = Some(e) }
    })
    val (t1, t2) = (writer2(half._1), writer2(half._2))
    try {
      t1.start(); t2.start(); t1.join(300000); t2.join(300000)
    } finally spark.conf.unset("spark.graft.ingest.lockWaitMs")
    failure2.foreach(throw _)
    val seq2 = new MetricStore(spark,
      Files.createTempDirectory("graft-conc-same-seq").toString, policy)
    seq2.addMeasures(df(ptsS))
    def dump2(x: MetricStore) = x.aggregates
      .select("metric_id", "method", "gran_s", "bucket", "value")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Number](2).longValue(),
        r.getTimestamp(3).toString, r.getDouble(4))).toSet
    assert(dump2(new MetricStore(spark, dir2, policy)) == dump2(seq2))
  }

  test("FUZZ mixed concurrency: expunge runs beside disjoint-sack " +
      "ingest with zero waits; all-sack compaction queues against an " +
      "ingest via ordered acquisition (no deadlock)") {
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(161616L))
    val baseS = ts("2014-01-01 00:00:00").getTime / 1000
    val policy = ArchivePolicy("mx", 1000000,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean", "count"))
    val s = spark
    import s.implicits._
    def df(rows: Seq[(String, Long, Double)]) =
      rows.map { case (m, t, v) =>
        (m, new java.sql.Timestamp(t * 1000), v) }
        .toDF("metric_id", "timestamp", "value")
    val dir = Files.createTempDirectory("graft-mixed").toString
    val sackOfA = MetricStore.sackOfId("a1")
    val as = (1 to 400).map("a" + _)
      .filter(MetricStore.sackOfId(_) == sackOfA).take(2)
    val bs = (1 to 400).map("b" + _)
      .filter(m => MetricStore.sackOfId(m) != sackOfA).take(2)
    def pts(ms: Seq[String]) = (for {
      m <- ms; _ <- 0 until 20
    } yield (m, baseS + rnd.nextInt(86400 / 30) * 30L,
      math.round(rnd.nextDouble() * 1000) / 10.0))
      .groupBy(p => (p._1, p._2)).map(_._2.head).toVector
    val (ptsA, ptsB) = (pts(as), pts(bs))
    val seed = new MetricStore(spark, dir, policy)
    seed.addMeasures(df(ptsB)) // B's rows exist before the expunge
    // phase 1: ingest A beside expunge B — disjoint sacks, zero waits,
    // so any lock contention or staging sweep of the live peer throws
    spark.conf.set("spark.graft.ingest.lockWaitMs", "0")
    val start = new java.util.concurrent.CyclicBarrier(2)
    @volatile var failure: Option[Throwable] = None
    def th(f: => Unit) = new Thread(() => {
      try { start.await(); f }
      catch { case e: Throwable => failure = Some(e) }
    })
    val tIngest = th(new MetricStore(spark, dir, policy)
      .addMeasures(df(ptsA)))
    val tExpunge = th(new MetricStore(spark, dir, policy)
      .expungeMetrics(bs))
    try {
      tIngest.start(); tExpunge.start()
      tIngest.join(300000); tExpunge.join(300000)
    } finally spark.conf.unset("spark.graft.ingest.lockWaitMs")
    failure.foreach(throw _)
    def dump(x: MetricStore) = x.aggregates
      .select("metric_id", "method", "bucket", "value")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2).toString, r.getDouble(3))).toSet
    val afterP1 = dump(new MetricStore(spark, dir, policy))
    val expected = {
      val ref = new MetricStore(spark,
        Files.createTempDirectory("graft-mixed-ref").toString, policy)
      ref.addMeasures(df(ptsA)); ref
    }
    assert(afterP1 == dump(expected),
      "ingest(A) beside expunge(B) diverged from A-only sequential")
    // phase 2: all-sack compaction queues against a concurrent ingest
    // (ordered acquisition, generous wait) — both must complete and
    // compaction must not change content
    val ptsA2 = pts(as).map { case (m, t, v) => (m, t + 90 * 86400L, v) }
    spark.conf.set("spark.graft.ingest.lockWaitMs", "120000")
    val start2 = new java.util.concurrent.CyclicBarrier(2)
    @volatile var failure2: Option[Throwable] = None
    def th2(f: => Unit) = new Thread(() => {
      try { start2.await(); f }
      catch { case e: Throwable => failure2 = Some(e) }
    })
    val tIngest2 = th2(new MetricStore(spark, dir, policy)
      .addMeasures(df(ptsA2)))
    val tCompact = th2(new MetricStore(spark, dir, policy).compact())
    try {
      tIngest2.start(); tCompact.start()
      tIngest2.join(300000); tCompact.join(300000)
    } finally spark.conf.unset("spark.graft.ingest.lockWaitMs")
    failure2.foreach(throw _)
    expected.addMeasures(df(ptsA2))
    assert(dump(new MetricStore(spark, dir, policy)) == dump(expected),
      "compaction beside ingest diverged from sequential")
  }

  test("two batches accumulate; overlapping timestamps: new wins") {
    val store = newStore()
    store.addMeasures(measures(
      ("m", "2014-01-01 12:00:01", 1.0), ("m", "2014-01-01 12:00:02", 2.0)))
    store.addMeasures(measures(
      ("m", "2014-01-01 12:00:02", 20.0), ("m", "2014-01-01 12:01:00", 3.0)))
    val got = store.getMeasures("m", "mean", 60).orderBy("bucket")
      .collect().map(r => (r.getTimestamp(1).toString, r.getDouble(2))).toSeq
    assert(got == Seq(
      ("2014-01-01 12:00:00.0", (1.0 + 20.0) / 2), // 2.0 replaced by 20.0
      ("2014-01-01 12:01:00.0", 3.0)))
  }

  test("a store rooted under a dot-directory still reads its own data " +
      "(hidden-dir detection is RELATIVE to the plane root — a " +
      "~/.data/store root must not re-read as empty and let swapWrite " +
      "drop the first batch)") {
    val parent = Files.createTempDirectory("graft-dot")
    val dir = parent.resolve(".hidden").resolve("store").toString
    val policy = ArchivePolicy("test", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean"))
    val store = new MetricStore(spark, dir, policy)
    store.addMeasures(measures(("m", "2014-01-01 12:00:01", 1.0)))
    // second batch goes down the WARM path: it must see batch 1's
    // aggregates (a reader that skips everything under "/." would
    // treat the plane as absent and replace it wholesale)
    store.addMeasures(measures(("m", "2014-01-01 12:00:02", 3.0)))
    val got = store.getMeasures("m", "mean", 60)
      .collect().map(_.getDouble(2)).toSeq
    assert(got == Seq(2.0)) // mean(1,3) — both batches present
  }

  test("incremental result == full recompute (storage/__init__.py:643-668)") {
    val storeInc = newStore()
    val storeFull = newStore()
    val b1 = measures(
      ("m", "2014-01-01 12:00:01", 1.0), ("m", "2014-01-01 12:05:00", 5.0),
      ("n", "2014-01-01 12:00:30", 7.0))
    val b2 = measures(
      ("m", "2014-01-01 12:05:30", 6.0), ("n", "2014-01-01 12:06:00", 8.0))
    storeInc.addMeasures(b1); storeInc.addMeasures(b2)
    storeFull.addMeasures(b1.unionByName(b2))
    def dump(s: MetricStore) = s.aggregates
      .select("metric_id", "method", "bucket", "value")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2).toString, r.getDouble(3))).toSet
    assert(dump(storeInc) == dump(storeFull))
  }

  test("FUZZ incremental == full recompute: random points across split " +
      "boundaries, random batch partitions, two granularities, rate " +
      "methods (storage/__init__.py:643-668)") {
    // The fixed example above pins one shape; this arm explores the
    // space that actually breaks incremental aggregation — points
    // straddling the 3600-bucket split boundary, metrics whose batches
    // interleave, coarse+fine granularities sharing one write, rate
    // diffs across batch edges. backWindow is huge so no point
    // rejects (the reject path has its own pins below) and generated
    // timestamps are unique per metric (new-wins batch order is the
    // m1 pin, not this one).
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(14141414L))
    val baseS = ts("2014-01-01 00:00:00").getTime / 1000
    for (round <- 0 until 6) {
      val policy = ArchivePolicy("fz", 1000000,
        Seq(ArchivePolicyItem(Granularity.seconds(60), None, None),
          ArchivePolicyItem(Granularity.seconds(300), None, None)),
        Set("mean", "sum", "max", "count", "rate:sum"))
      def st() = new MetricStore(spark,
        Files.createTempDirectory("graft-fuzz-store").toString, policy)
      val storeInc = st(); val storeFull = st()
      // ~50 points per metric over ~5 days — the 60s splits are 60 h
      // wide, so a range past that crosses a split boundary sometimes;
      // cluster some points tightly so buckets get multiple values
      val pts = (for {
        m <- Seq("a", "b", "c")
        _ <- 0 until (20 + rnd.nextInt(40))
      } yield {
        val t = baseS + (rnd.nextInt(5 * 86400 / 30) * 30L) +
          (if (rnd.nextBoolean()) rnd.nextInt(30) else 0)
        (m, t, math.round(rnd.nextDouble() * 1000) / 10.0)
      }).groupBy(p => (p._1, p._2)).map(_._2.head).toVector // unique ts/metric
      val s = spark
      import s.implicits._
      def df(rows: Seq[(String, Long, Double)]) =
        rows.map { case (m, t, v) =>
          (m, new java.sql.Timestamp(t * 1000), v) }
          .toDF("metric_id", "timestamp", "value")
      // random partition into 1..5 batches, shuffled (order can't
      // matter: unique timestamps, huge back window)
      val shuffled = rnd.shuffle(pts)
      val nb = 1 + rnd.nextInt(5)
      val batches = shuffled.zipWithIndex.groupMap(_._2 % nb)(_._1)
        .toSeq.sortBy(_._1).map(_._2)
      batches.foreach(b => storeInc.addMeasures(df(b)))
      storeFull.addMeasures(df(pts))
      def dump(x: MetricStore) = x.aggregates
        .select("metric_id", "method", "gran_s", "bucket", "value")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getAs[Number](2).longValue(),
          r.getTimestamp(3).toString, r.getDouble(4))).toSet
      val (di, dfu) = (dump(storeInc), dump(storeFull))
      assert(di == dfu, s"round $round (${batches.size} batches, " +
        s"${pts.size} points): inc-only=${(di -- dfu).take(5)} " +
        s"full-only=${(dfu -- di).take(5)}")
    }
  }

  test("FUZZ back-window acceptance under random arrival order == the " +
      "reference's sequential contract (carbonara.py:354-373)") {
    // The huge-window fuzz above pins incremental==full where nothing
    // rejects; this arm pins the M2 REJECT path: a tight back window,
    // shuffled batches (so genuinely out-of-order arrivals), and an
    // exact in-test oracle that replays the reference's acceptance
    // sequentially — incoming point accepted iff
    // ts >= floor(old_last/block)*block - backWindow*block, where
    // old_last is the buffer's max BEFORE the batch; new-wins merge;
    // aggregates over every point ever accepted (stored buckets are
    // never un-computed by later truncation).
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(272727L))
    val baseS = ts("2014-01-01 00:00:00").getTime / 1000
    val backWindow = 2
    val grans = Seq(60L, 300L)
    val blockS = grans.max
    for (round <- 0 until 5) {
      val policy = ArchivePolicy("bw", backWindow,
        grans.map(g => ArchivePolicyItem(Granularity.seconds(g), None, None)),
        Set("mean", "sum", "max", "count"))
      val store = new MetricStore(spark,
        Files.createTempDirectory("graft-fuzz-bw").toString, policy)
      val pts = (for {
        m <- Seq("a", "b")
        _ <- 0 until (30 + rnd.nextInt(30))
      } yield (m, baseS + rnd.nextInt(8 * 3600).toLong,
        math.round(rnd.nextDouble() * 1000) / 10.0))
        .groupBy(p => (p._1, p._2)).map(_._2.head).toVector
      val shuffled = rnd.shuffle(pts)
      val nb = 2 + rnd.nextInt(4)
      val batches = shuffled.zipWithIndex.groupMap(_._2 % nb)(_._1)
        .toSeq.sortBy(_._1).map(_._2)
      val s = spark
      import s.implicits._
      // oracle state: accepted points per metric, replayed in batch order
      val acceptedState =
        scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[Long, Double]]
      for (b <- batches) {
        val oldLast: Map[String, Long] =
          acceptedState.view.mapValues(_.keys.max).toMap
        for ((m, t, v) <- b) {
          val ok = oldLast.get(m).forall(l =>
            t >= math.floorDiv(l, blockS) * blockS - blockS * backWindow)
          if (ok) acceptedState.getOrElseUpdate(m,
            scala.collection.mutable.Map.empty)(t) = v
        }
        store.addMeasures(b.map { case (m, t, v) =>
          (m, new java.sql.Timestamp(t * 1000), v) }
          .toDF("metric_id", "timestamp", "value"))
      }
      val expected = (for {
        (m, ptsM) <- acceptedState.toSeq
        g <- grans
        (bucket, vs) <- ptsM.toSeq.groupBy { case (t, _) =>
          math.floorDiv(t, g) * g }
        vals = vs.map(_._2)
        (method, v) <- Seq(
          "mean" -> vals.sum / vals.size, "sum" -> vals.sum,
          "max" -> vals.max, "count" -> vals.size.toDouble)
      } yield (m, method, g, bucket, math.round(v * 1e6) / 1e6)).toSet
      val got = store.aggregates
        .select("metric_id", "method", "gran_s", "bucket", "value")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getAs[Number](2).longValue(),
          r.getTimestamp(3).getTime / 1000,
          math.round(r.getDouble(4) * 1e6) / 1e6)).toSet
      assert(got == expected, s"round $round (${batches.size} batches): " +
        s"store-only=${(got -- expected).take(4)} " +
        s"oracle-only=${(expected -- got).take(4)}")
    }
  }

  test("back-window rejects too-old points (carbonara.py:354-373)") {
    val store = newStore(backWindow = 0)
    store.addMeasures(measures(("m", "2014-01-01 13:00:00", 9.0)))
    // block = 60 s, back_window 0 → floor = 13:00; 12:59:59 is too old
    store.addMeasures(measures(("m", "2014-01-01 12:59:59", 1.0)))
    val got = store.getMeasures("m", "mean", 60).collect()
    assert(got.map(_.getDouble(2)).toSeq == Seq(9.0))
  }

  test("back-window 1 accepts one block back") {
    val store = newStore(backWindow = 1)
    store.addMeasures(measures(("m", "2014-01-01 13:00:00", 9.0)))
    store.addMeasures(measures(("m", "2014-01-01 12:59:59", 1.0)))
    val got = store.getMeasures("m", "mean", 60).orderBy("bucket").collect()
    assert(got.map(_.getDouble(2)).toSeq == Seq(1.0, 9.0))
  }

  test("rate: methods survive incremental batching (+1 block history)") {
    val storeInc = newStore(methods = Set("rate:sum"))
    val storeFull = newStore(methods = Set("rate:sum"))
    val b1 = measures(
      ("m", "2014-01-01 12:00:10", 1.0), ("m", "2014-01-01 12:00:50", 4.0))
    val b2 = measures(("m", "2014-01-01 12:01:10", 9.0))
    storeInc.addMeasures(b1); storeInc.addMeasures(b2)
    storeFull.addMeasures(b1.unionByName(b2))
    def dump(s: MetricStore) = s.aggregates
      .select("bucket", "value").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toSet
    // diffs: 3 @12:00:50, 5 @12:01:10 → buckets 12:00 → 3.0, 12:01 → 5.0
    assert(dump(storeFull) ==
      Set(("2014-01-01 12:00:00.0", 3.0), ("2014-01-01 12:01:00.0", 5.0)))
    assert(dump(storeInc) == dump(storeFull))
  }

  test("duplicate batch delivery is idempotent (exactly-once via overwrite)") {
    val store = newStore()
    val batch = measures(
      ("m", "2024-01-01 10:00:10", 2.0), ("m", "2024-01-01 10:00:40", 4.0))
    store.addMeasures(batch)
    def snap() = store.aggregates
      .select("metric_id", "method", "bucket", "value")
      .collect().map(_.toSeq).toSet
    val first = snap()
    store.addMeasures(batch) // at-least-once delivery re-sends the batch
    assert(snap() == first)
  }

  test("sack layout: a batch rewrites only the touched metric's sack") {
    val dir = Files.createTempDirectory("graft-store").toString
    val policy = ArchivePolicy("test", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)), Set("mean"))
    val store = new MetricStore(spark, dir, policy)
    // pick two metric ids landing in different sacks
    val ids = (0 until 64).map(i => s"m$i")
    val sackOfId = ids.map { id =>
      id -> spark.range(1).select(MetricStore.sackOf(lit(id))).head.getInt(0)
    }.toMap
    val (mA, mB) = {
      val a = ids.head
      val b = ids.find(i => sackOfId(i) != sackOfId(a)).get
      (a, b)
    }
    store.addMeasures(measures(
      (mA, "2014-01-01 12:00:01", 1.0), (mB, "2014-01-01 12:00:02", 2.0)))
    def sackFiles(sack: Int): Map[String, Long] = {
      val d = new java.io.File(s"$dir/raw/sack=$sack")
      if (!d.exists) Map.empty
      else d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    }
    val aBefore = sackFiles(sackOfId(mA))
    val bBefore = sackFiles(sackOfId(mB))
    assert(aBefore.nonEmpty && bBefore.nonEmpty)
    Thread.sleep(1100) // mtime granularity
    store.addMeasures(measures((mB, "2014-01-01 12:02:00", 3.0)))
    // metric A's sack files untouched; metric B's sack rewritten
    assert(sackFiles(sackOfId(mA)) == aBefore)
    assert(sackFiles(sackOfId(mB)) != bBefore)
    // and the data is still complete
    assert(store.getMeasures(mA, "mean", 60).count() == 1)
    assert(store.getMeasures(mB, "mean", 60).count() == 2)
  }

  test("store rejects calendar-only and sub-second policies at construction") {
    val dir = Files.createTempDirectory("graft-store").toString
    intercept[IllegalArgumentException] {
      new MetricStore(spark, dir, ArchivePolicy("cal", 0,
        Seq(ArchivePolicyItem(Granularity.Calendar("M"), None, None)),
        Set("mean")))
    }
    intercept[IllegalArgumentException] {
      new MetricStore(spark, dir, ArchivePolicy("sub", 0,
        Seq(ArchivePolicyItem(Granularity.Fixed(500_000_000L), None, None)),
        Set("mean")))
    }
  }

  test("calendar read: declared units resample the fixed series on read") {
    val dir = Files.createTempDirectory("graft-store").toString
    val store = new MetricStore(spark, dir, ArchivePolicy("cal", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None),
        ArchivePolicyItem(Granularity.Calendar("M"), None, None)),
      Set("mean", "max")))
    store.addMeasures(measures(
      // Jan: minute buckets (1+3)/2=2.0 and 10.0 → monthly mean-of-means 6.0
      ("m", "2014-01-03 12:00:01", 1.0), ("m", "2014-01-03 12:00:30", 3.0),
      ("m", "2014-01-20 08:15:00", 10.0),
      // Feb: one bucket
      ("m", "2014-02-02 00:00:00", 7.0)))
    val got = store.getMeasuresCalendar(Seq("m"), Seq("mean", "max"), "M", 60)
      .orderBy("method", "bucket").collect()
      .map(r => (r.getString(1), r.getTimestamp(2).toString, r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      ("max", "2014-01-01 00:00:00.0", 10.0),
      ("max", "2014-02-01 00:00:00.0", 7.0),
      ("mean", "2014-01-01 00:00:00.0", 6.0),
      ("mean", "2014-02-01 00:00:00.0", 7.0)))
    // undeclared unit refuses loudly (policy-bounded, like granularities)
    intercept[IllegalArgumentException] {
      store.getMeasuresCalendar(Seq("m"), Seq("mean"), "W", 60)
    }
  }

  test("split-key math: 3600 buckets per split (carbonara.py:730-871)") {
    val s = spark
    import s.implicits._
    // gran 5 s -> one split spans 18000 s; epoch 18000*k..18000*(k+1)-1
    val df = Seq("1970-01-01 00:00:00", "1970-01-01 04:59:55",
      "1970-01-01 05:00:00").map(java.sql.Timestamp.valueOf).toDF("bucket")
    val got = df.select(graft.ingest.MetricStore.splitOf(col("bucket"), 5))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 1L))
  }

  test("retention expiry drops old splits (J3)") {
    val dir = Files.createTempDirectory("graft-store").toString
    val policy = ArchivePolicy("short", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None,
        Some(3600L * 1_000_000_000L))), // keep 1 h
      Set("mean"))
    val store = new MetricStore(spark, dir, policy)
    store.addMeasures(measures(
      ("m", "2014-01-01 00:00:30", 1.0),   // split 0 relative to day
      ("m", "2014-01-05 12:00:30", 2.0)))  // recent split
    val nowS = java.sql.Timestamp.valueOf("2014-01-05 12:30:00").getTime / 1000
    store.expireRetention(nowS)
    val got = store.aggregates.select("value").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(2.0))
  }

  test("driver-side sackOfId matches the sackOf column") {
    import spark.implicits._
    val ids = (0 until 200).map(i => s"metric-$i") ++
      Seq("", "µ-unicode-✓", "a" * 300)
    val viaCol = ids.toDF("metric_id")
      .select(col("metric_id"), MetricStore.sackOf(col("metric_id")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    ids.foreach { id =>
      assert(MetricStore.sackOfId(id) == viaCol(id), s"id=$id")
    }
  }

  test("warm batch rewrites only its own metric sacks (msack layout)") {
    val root = Files.createTempDirectory("graft-store").toString
    val store = new MetricStore(spark, root, ArchivePolicy("test", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    // two metrics in different sacks, same hour
    val Seq(a, b) = {
      val cands = (0 until 64).map(i => s"m$i")
      val x = cands.head
      val y = cands.find(c =>
        MetricStore.sackOfId(c) != MetricStore.sackOfId(x)).get
      Seq(x, y)
    }
    store.addMeasures(measures(
      (a, "2014-01-01 12:00:01", 1.0), (b, "2014-01-01 12:00:02", 2.0)))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def aggFiles(sack: Int): Map[String, Long] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root), true)
      val out = scala.collection.mutable.Map[String, Long]()
      while (it.hasNext) {
        val f = it.next()
        val p = f.getPath.toString
        if (p.contains(s"/msack=$sack/") && p.endsWith(".parquet"))
          out(p) = f.getModificationTime
      }
      out.toMap
    }
    val bSack = MetricStore.sackOfId(b)
    val before = aggFiles(bSack)
    assert(before.nonEmpty)
    Thread.sleep(1100) // FS mtime granularity
    // warm batch touches only metric a → b's sack partitions must not
    // be re-read or re-written (O(batch sacks) rewrite, not O(split))
    store.addMeasures(measures((a, "2014-01-01 12:00:05", 3.0)))
    assert(aggFiles(bSack) == before,
      "untouched msack partition files were rewritten by a warm batch")
    // and the data is still correct
    val gotA = store.getMeasures(a, "mean", 60).collect().map(_.getDouble(2))
    val gotB = store.getMeasures(b, "mean", 60).collect().map(_.getDouble(2))
    assert(gotA.toSeq == Seq(2.0) && gotB.toSeq == Seq(2.0))
  }

  test("stale staging from a crashed writer is invisible to reads and " +
      "cleaned by the next warm write") {
    val dir = Files.createTempDirectory("graft-store").toString
    val policy = ArchivePolicy("crash", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)), Set("mean"))
    val store = new MetricStore(spark, dir, policy)
    store.addMeasures(measures(("m", "2014-01-01 12:00:01", 4.0)))
    // a crashed swapWrite leaves a dot-staging subtree with arbitrary
    // partial content — plant one with a CONFLICTING schema to prove
    // readers never even list it
    val staging = new java.io.File(s"$dir/agg/.staging-dead/method=mean")
    staging.mkdirs()
    val s = spark
    import s.implicits._
    Seq(("x", 1)).toDF("a", "b").write
      .parquet(s"$dir/agg/.staging-dead/method=mean/gran_s=60")
    assert(store.aggregates.filter(col("method") === "mean").count() == 1)
    // FRESH staging may belong to a LIVE writer on other sacks — the
    // sweep is age-gated, so a warm write leaves it alone
    store.addMeasures(measures(("m", "2014-01-01 12:00:31", 5.0)))
    assert(new java.io.File(s"$dir/agg/.staging-dead").exists(),
      "fresh (possibly live) staging was swept")
    // once OLDER than lockStaleMs it can only be a crashed writer's:
    // the next warm write clears the corpse and lands its own content
    def ageDir(p: String): Unit = {
      val f = new java.io.File(p)
      f.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L)
    }
    ageDir(s"$dir/agg/.staging-dead")
    store.addMeasures(measures(("m", "2014-01-01 12:01:01", 6.0)))
    assert(!new java.io.File(s"$dir/agg/.staging-dead").exists(),
      "stale staging survived a warm write")
    assert(store.getMeasures("m", "mean", 60).collect()
      .map(_.getDouble(2)).sorted.toSeq == Seq(4.5, 6.0)) // mean(4,5), 6
  }

  test("expunge removes rate-method partitions (escaped dirs: " +
      "method=rate%3Amean) and truncateRaw keeps the rate history block") {
    val dir = Files.createTempDirectory("graft-esc").toString
    val policy = ArchivePolicy("esc", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("rate:mean", "mean"))
    val store = new MetricStore(spark, dir, policy)
    store.addMeasures(measures(
      ("m", "2014-01-01 12:00:10", 1.0), ("m", "2014-01-01 12:00:50", 4.0),
      ("m", "2014-01-01 12:01:10", 9.0)))
    assert(new java.io.File(s"$dir/agg/method=rate%3Amean").exists,
      "precondition: spark writes the escaped partition dir")
    // truncateRaw must retain the +1 rate-history block the ingest
    // path keeps: after re-truncation, a warm point recomputes its
    // bucket WITH the cross-block predecessor diff (9→4 at 12:00:50 →
    // diff 5 at 12:01:10); the buggy bare-backWindow truncation
    // dropped 12:00:50 and the recomputed 12:01 lost that diff
    store.truncateRaw()
    assert(store.rawBuffer.count() == 3,
      "rate policy: truncateRaw discarded the predecessor block")
    store.addMeasures(measures(("m", "2014-01-01 12:01:20", 11.0)))
    val after = store.getMeasures("m", "rate:mean", 60)
      .collect().map(r => (r.getTimestamp(1).toString, r.getDouble(2))).toSet
    assert(after == Set(
      ("2014-01-01 12:00:00.0", 3.0),            // diff 4-1
      ("2014-01-01 12:01:00.0", (5.0 + 2.0) / 2) // diffs 9-4, 11-9
    ))
    // expunge must clean the ESCAPED method dirs too
    store.expungeMetric("m")
    assert(store.aggregates.isEmpty)
    def anyFileUnder(p: java.io.File): Boolean =
      p.exists && {
        if (p.isFile) true
        else p.listFiles().exists(anyFileUnder)
      }
    assert(!anyFileUnder(new java.io.File(s"$dir/agg/method=rate%3Amean")),
      "expunged rate partitions survived on disk")
  }

  test("crashed swapWrite whose staging holds the only copy of a " +
      "partition is refused, not swept") {
    val dir = Files.createTempDirectory("graft-crash").toString
    val policy = ArchivePolicy("crash", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)), Set("mean"))
    val store = new MetricStore(spark, dir, policy)
    store.addMeasures(measures(("m", "2014-01-01 12:00:01", 4.0)))
    // simulate the crash WINDOW: a committed staging (_SUCCESS) whose
    // leaf has no surviving destination — the sole copy
    val staging = new java.io.File(
      s"$dir/agg/.staging-dead/method=mean/gran_s=60/split=0/msack=0")
    staging.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/agg/.staging-dead/_SUCCESS"),
      Array.empty[Byte])
    java.nio.file.Files.write(
      java.nio.file.Paths.get(staging.getPath + "/part-0.parquet"),
      Array[Byte](1, 2, 3))
    // age the staging past lockStaleMs: the sweep only examines
    // age-stale staging (fresh = possibly a live writer's)
    def ageStaging(): Unit = new java.io.File(s"$dir/agg/.staging-dead")
      .setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L)
    ageStaging()
    val e = intercept[IllegalStateException](
      store.addMeasures(measures(("m", "2014-01-01 12:01:01", 6.0))))
    assert(e.getMessage.contains("only copy"))
    assert(new java.io.File(s"$dir/agg/.staging-dead").exists,
      "the sole-copy staging was destroyed")
    // an UNCOMMITTED staging (no _SUCCESS) is the ordinary crash case:
    // swept, and the write proceeds
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/agg/.staging-dead/_SUCCESS"))
    ageStaging() // the delete refreshed the dir mtime
    store.addMeasures(measures(("m", "2014-01-01 12:01:01", 6.0)))
    assert(!new java.io.File(s"$dir/agg/.staging-dead").exists)
    assert(store.getMeasures("m", "mean", 60).collect()
      .map(_.getDouble(2)).sorted.toSeq == Seq(4.0, 6.0))
  }

  test("distributed-metadata fallback == driver fast path, byte for byte " +
      "(J1 at unbounded metric cardinality)") {
    // Exercises every metadata consumer through both paths: cold write,
    // warm write with accepted AND rejected late points (back window),
    // overlap rewrite, rate: (+1 back block), multi-metric multi-sack.
    val b1 = measures(
      ("m0", "2014-01-01 12:00:10", 1.0), ("m0", "2014-01-01 12:00:50", 4.0),
      ("m1", "2014-01-01 12:03:30", 7.0), ("m2", "2014-01-01 12:01:00", 2.0),
      ("m3", "2014-01-01 11:00:00", 5.0))
    val b2 = measures(
      ("m0", "2014-01-01 12:01:10", 9.0), // in-order continuation
      ("m0", "2014-01-01 12:00:50", 40.0), // overlap: new wins
      ("m1", "2014-01-01 12:02:59", 6.0), // one block back: accepted (bw=1)
      ("m3", "2014-01-01 09:00:00", 1.0), // far too old: rejected
      ("m4", "2014-01-01 12:05:05", 3.0)) // brand-new metric in warm batch
    def build(forceFallback: Boolean): MetricStore = {
      spark.conf.set("spark.graft.ingest.maxDriverMetrics",
        if (forceFallback) "0" else "100000")
      try {
        val store = newStore(backWindow = 1,
          methods = Set("mean", "count", "rate:sum"))
        store.addMeasures(b1)
        store.addMeasures(b2)
        store
      } finally
        spark.conf.set("spark.graft.ingest.maxDriverMetrics", "100000")
    }
    def dumpAgg(s: MetricStore) = s.aggregates
      .select("metric_id", "method", "gran_s", "split", "msack", "bucket", "value")
      .collect().map(_.toSeq).toSet
    def dumpRaw(s: MetricStore) = s.rawBuffer
      .select("metric_id", "timestamp", "value", "sack")
      .collect().map(_.toSeq).toSet
    val fast = build(forceFallback = false)
    val fb = build(forceFallback = true)
    assert(dumpAgg(fb) == dumpAgg(fast))
    assert(dumpRaw(fb) == dumpRaw(fast))
    assert(dumpAgg(fast).nonEmpty && dumpRaw(fast).nonEmpty)
  }

  test("scan-shaped batches (persist skipped) ingest to the same store " +
      "bytes as aggregate-shaped ones (persisted): the conditional " +
      "batch persist is a pure optimization") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("m1", "2014-01-01 12:00:10", 1.0), ("m1", "2014-01-01 12:01:10", 2.0),
      ("m2", "2014-01-01 12:00:40", 7.0), ("m2", "2014-01-01 12:05:10", 9.0))
    // scan-shaped: a parquet-backed projection — no aggregate/join in
    // the plan, so addMeasures skips its internal persist
    val pq = java.nio.file.Files.createTempDirectory("graft-scanshape")
      .toString + "/batch.parquet"
    measures(rows: _*).write.parquet(pq)
    val scanBatch = spark.read.parquet(pq)
      .select("metric_id", "timestamp", "value")
    // aggregate-shaped: identical rows behind a groupBy — takes the
    // persisted path
    val aggBatch = measures(rows: _*)
      .groupBy("metric_id", "timestamp")
      .agg(first(col("value")).as("value"))
    def dump(s: MetricStore) = s.aggregates
      .select("metric_id", "method", "gran_s", "split", "msack", "bucket",
        "value")
      .collect().map(_.toSeq).toSet
    val a = newStore(); a.addMeasures(scanBatch)
    val b = newStore(); b.addMeasures(aggBatch)
    assert(dump(a) == dump(b))
    assert(dump(a).nonEmpty)
  }
}
