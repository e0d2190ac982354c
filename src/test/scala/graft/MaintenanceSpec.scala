package graft

import org.apache.spark.sql.functions._
import graft.api.Graft
import graft.catalog.Maintenance
import graft.model.ArchivePolicy

class MaintenanceSpec extends SparkSpec {

  test("deleteMetric expunges staged, raw, and aggregate data") {
    val root = java.nio.file.Files.createTempDirectory("graft-del").toString
    val g = new Graft(spark, root)
    g.createMetric("m1", "low")
    g.createMetric("m2", "low")
    g.addMeasures("m1", Seq(("2024-01-01 10:00:00", 1.0)))
    g.addMeasures("m2", Seq(("2024-01-01 10:00:00", 2.0)))
    g.process()
    g.addMeasures("m1", Seq(("2024-01-01 10:05:00", 3.0)))
    assert(g.status() == Map("m1" -> 1L))
    g.deleteMetric("m1")
    assert(g.status().isEmpty)
    assert(g.getMeasures("m2", "mean").nonEmpty)
    intercept[IllegalArgumentException](g.deleteMetric("m1"))
    intercept[NoSuchElementException](g.getMeasures("m1", "mean"))
  }

  test("batched expunge == sequential expunge, one rewrite per policy " +
      "(J4 janitor batch)") {
    def build(root: String): Graft = {
      val g = new Graft(spark, root)
      // enough metrics to land in several msacks, two kept
      val ids = (0 until 12).map(i => s"bm$i")
      ids.foreach(g.createMetric(_, "low"))
      ids.zipWithIndex.foreach { case (m, i) =>
        g.addMeasures(m, Seq(
          (f"2024-01-01 10:${i % 60}%02d:00", i.toDouble),
          (f"2024-01-02 11:${i % 60}%02d:00", i * 2.0)))
      }
      g.process()
      g
    }
    val rootA = java.nio.file.Files.createTempDirectory("graft-delA").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft-delB").toString
    val doomed = (0 until 12).collect { case i if i % 3 != 0 => s"bm$i" }
    val gA = build(rootA)
    gA.deleteMetrics(doomed) // one batched rewrite
    val gB = build(rootB)
    doomed.foreach(gB.deleteMetric) // N sequential rewrites
    def dump(g: Graft): Set[Seq[Any]] = (0 until 12).map(i => s"bm$i")
      .filterNot(doomed.contains)
      .flatMap(m => g.getMeasures(m, "mean").map {
        case (t, gr, v) => Seq(m, t.toString, gr, v)
      }).toSet
    assert(dump(gA) == dump(gB))
    assert(dump(gA).nonEmpty)
    doomed.foreach { m =>
      intercept[NoSuchElementException](gA.getMeasures(m, "mean"))
    }
  }

  test("resurrection round-trip: end-date -> current ingest un-ends the resource " +
      "(storage/__init__.py:694-725)") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-res").toString
    val g = new Graft(spark, root)
    g.createMetric("m1", "low")
    g.createMetric("m2", "low")
    g.setMetrics(Seq(("m1", "r1", "cpu"), ("m2", "r2", "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    g.setResources(Seq(
      ("r1", Some(ts("2024-01-01 12:00:00"))), // ended at noon
      ("r2", Some(ts("2024-01-01 12:00:00"))))
      .toDF("id", "ended_at"))
    // m1 gets a measure AFTER the end date -> r1 resurrects;
    // m2 gets only an older backfill point -> r2 stays ended
    g.addMeasures("m1", Seq(("2024-01-01 13:00:00", 1.0)))
    g.addMeasures("m2", Seq(("2024-01-01 10:00:00", 2.0)))
    g.process()
    val endedAt = g.searchResources("id != \"zzz\"")
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(endedAt("r1") == null)
    assert(endedAt("r2") != null)
    assert(g.lastMeasureTimestamp("m1").contains(ts("2024-01-01 13:00:00")))
    assert(g.lastMeasureTimestamp("m2").contains(ts("2024-01-01 10:00:00")))
  }

  test("janitor service loop: drains the backlog, expires retention, " +
      "end-dates inactive resources, auto-cleans expired ones; the " +
      "stop-after-processing probe drains without timers " +
      "(cli/metricd.py:160-358)") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-jan").toString
    val g = new Graft(spark, root)
    g.createPolicy(ArchivePolicy("jan", 0,
      Seq(graft.model.ArchivePolicyItem(graft.model.Granularity.seconds(60),
        None, Some(3600L * 1_000_000_000L))), // keep 1 h
      Set("mean")))
    g.createMetric("act", "jan") // stays active
    g.createMetric("idle", "jan") // long inactive → its resource ends
    g.setMetrics(Seq(("act", "ra", "cpu"), ("idle", "ri", "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    g.setResources(Seq(
      ("ra", Option.empty[java.sql.Timestamp]),
      ("ri", Option.empty[java.sql.Timestamp]),
      ("rx", Some(ts("2014-01-01 00:00:00")))) // ended long ago
      .toDF("id", "ended_at"))
    // an OLD split (outside retention at `now`) plus a recent bucket
    g.addMeasures("act", Seq(("2014-01-01 00:00:30", 1.0),
      ("2014-01-05 12:00:30", 2.0)))
    g.addMeasures("idle", Seq(("2014-01-03 00:00:30", 7.0)))
    val nowS = ts("2014-01-05 12:30:00").getTime / 1000
    val jan = new graft.api.Janitor(g,
      processingDelayS = 0.05, cleanupDelayS = 0.05,
      reportingDelayS = 0.05,
      metricInactiveAfterS = Some(24 * 3600L), // idle's last: 2.5 d back
      resourceCleanupAfterS = Some(3 * 24 * 3600L), // rx: ended 4.5 d back
      clockS = () => nowS)
    assert(g.status().nonEmpty, "precondition: staged backlog")
    jan.start()
    val deadline = System.currentTimeMillis() + 180000
    while ((jan.metricsProcessed < 2 || jan.cleanupPasses < 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    jan.stop()
    assert(jan.metricsProcessed >= 2, "processor pass never drained")
    assert(jan.cleanupPasses >= 1, "janitor pass never ran")
    // processor drained: backlog empty and measures queryable
    assert(g.status().isEmpty)
    // J3 via the loop: the 2014-01-01 split expired, recent survives
    assert(g.getMeasures("act", "mean").map(_._3) === Seq(2.0))
    // J6 via the loop: ri end-dated (inactive > 24 h), ra untouched,
    // rx deleted (ended > 3 d before now)
    val ended = g.searchResources("id != \"z\"").collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    assert(!ended.contains("rx"), "expired resource not auto-cleaned")
    assert(ended("ra") == null, "active resource was end-dated")
    assert(ended("ri") != null, "inactive resource not end-dated")
    assert(jan.resourcesAutoCleaned === 1L)
    // J7 via the loop: the last report reflects the drained state
    assert(jan.lastBacklog.isEmpty ||
      jan.reportOnce().isEmpty)
    // probe mode (--stop-after-processing-metrics): stage more, drain
    // without timers, report how many metrics were processed
    g.addMeasures("act", Seq(("2014-01-05 12:10:30", 4.0)))
    assert(jan.stopAfterProcessingMetrics(1) === 1L)
    assert(g.status().isEmpty)
  }

  test("janitor under churn: the loop drains while metrics are " +
      "created, measured, and deleted from the caller thread") {
    val root = java.nio.file.Files.createTempDirectory("graft-churnjan")
      .toString
    val g = new Graft(spark, root)
    g.createPolicy(ArchivePolicy("cj", 0,
      Seq(graft.model.ArchivePolicyItem(graft.model.Granularity.seconds(60),
        None, None)), Set("mean", "count")))
    val jan = new graft.api.Janitor(g,
      processingDelayS = 0.05, cleanupDelayS = 0.2, reportingDelayS = 0.2)
    jan.start()
    try {
      for (i <- 0 until 12) {
        val m = s"cj$i"
        g.createMetric(m, "cj")
        g.addMeasures(m, Seq((f"2014-01-01 10:${i % 60}%02d:01", i.toDouble)))
        if (i % 4 == 3) g.deleteMetric(s"cj${i - 1}")
        if (i % 3 == 2) Thread.sleep(60) // let passes interleave
      }
    } finally jan.stop()
    // one final drain settles whatever the loop had not reached yet
    jan.processOnce()
    assert(g.status().isEmpty, "backlog not drained after churn")
    // deleted: cj2, cj6, cj10; everything else retains its measure
    val expectGone = Set(2, 6, 10)
    for (i <- 0 until 12) {
      val m = s"cj$i"
      if (expectGone(i))
        intercept[NoSuchElementException](g.getMeasures(m, "mean"))
      else {
        val vs = g.getMeasures(m, "mean").map(_._3)
        assert(vs == Seq(i.toDouble), s"$m: $vs")
      }
    }
  }

  test("endDateInactive + autoClean lifecycle (chef.py:126-133, 180-181)") {
    val s = spark
    import s.implicits._
    val res = Seq(
      ("r1", Option.empty[java.sql.Timestamp]),
      ("r2", Option.empty[java.sql.Timestamp]),
      ("r3", Some(new java.sql.Timestamp(100_000L * 1000)))) // ended t=100k
      .toDF("id", "ended_at")
    val act = Seq(("r1", 1000L), ("r2", 900_000L)).toDF("resource_id", "last_ts_s")
    val now = 1_000_000L
    val ended = Maintenance.endDateInactive(res, act, now, inactiveS = 500_000L)
    val byId = ended.collect().map(r => r.getString(0) -> r.get(1)).toMap
    // the stamp is the janitor RUN time (chef.py:180-181 moment_now),
    // not the last activity timestamp
    assert(byId("r1") == new java.sql.Timestamp(now * 1000))
    assert(byId("r2") == null) // active recently
    // already-ended keeps its ORIGINAL stamp (chef.py:172-175)
    assert(byId("r3") == new java.sql.Timestamp(100_000L * 1000))
    // strict boundary (chef.py:126-133 `<`): last activity EXACTLY
    // inactiveS ago is not yet inactive
    val edge = Maintenance.endDateInactive(res.filter(col("id") === "r1"),
      Seq(("r1", now - 500_000L)).toDF("resource_id", "last_ts_s"),
      now, inactiveS = 500_000L)
    assert(edge.collect().head.get(1) == null)
    // grace: drop resources ended before now - grace; r1's fresh stamp
    // (= now) is inside ANY grace — detection starts the countdown
    val cleaned = Maintenance.autoClean(ended, now, graceS = 100_000L)
    assert(cleaned.select("id").collect().map(_.getString(0)).toSet ==
      Set("r1", "r2"))
    // boundary: ended EXACTLY graceS ago survives ("more than" deletes)
    val atBoundary = Maintenance.autoClean(ended, now, graceS = 900_000L)
    assert(atBoundary.select("id").collect().map(_.getString(0)).toSet ==
      Set("r1", "r2", "r3")) // r3 ended at t=100k = now - 900k
  }
}
