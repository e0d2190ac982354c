package graft

import graft.api.Graft
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}
import graft.catalog.ResourceTypes.{AttrSpec, AttrType, ResourceType}
import org.apache.spark.sql.functions._

/** Durable catalog plane (CatalogStore): the reference's indexer
  * survives restarts (indexer/sqlalchemy.py); every facade catalog
  * mutation must too — a reconstructed Graft on the same root serves
  * the same reads without re-registration.
  */
class CatalogPersistSpec extends SparkSpec {

  private def freshRoot =
    java.nio.file.Files.createTempDirectory("graft-persist").toString

  test("restart roundtrip: policy/rule/metric/resource through the " +
      "facade, ingest, tear down, reconstruct — getMeasures and " +
      "searchResources serve identically") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("dur", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean", "max")))
    g1.createPolicyRule("every*", "dur")
    g1.createMetric("m1", "dur", Some("requests"))
    g1.createMetric("everything-counts") // via the rule
    g1.setMetricCreator("m1", "alice")
    // resource plane: schema frame, then REST-shaped creates
    g1.setResources(Seq.empty[(String, String, String)]
      .toDF("id", "type", "zone"))
    g1.createResource("server", "r1", """{"zone": "east"}""")
    g1.createResource("server", "r2", """{"zone": "west"}""")
    g1.attachMetricsSchema("r1", Map("cpu" -> Left("m1")))
    g1.addMeasures("m1", Seq(
      ("2015-01-01 12:00:10", 2.0), ("2015-01-01 12:00:40", 4.0),
      ("2015-01-01 12:01:10", 6.0)))
    g1.process()
    val before = g1.getMeasures("m1", "mean")
    val beforeRes = g1.searchResources("zone = 'east'")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(before.nonEmpty && beforeRes.nonEmpty)
    g1.close() // release the catalog writer lock — g2 mutates below

    // restart: a brand-new Graft on the same root, no re-registration
    val g2 = new Graft(s, root)
    assert(g2.listPolicies.map(_.name).contains("dur"))
    assert(g2.listPolicyRules === g1.listPolicyRules)
    assert(g2.listMetrics === g1.listMetrics)
    assert(g2.metricUnitOf("m1") === Some("requests"))
    assert(g2.metricCreatorOf("m1") === Some("alice"))
    assert(g2.metricPolicyName("everything-counts") === "dur")
    assert(g2.getMeasures("m1", "mean") === before)
    assert(g2.getMeasures("m1", "max").map(_._3) === Seq(4.0, 6.0))
    assert(g2.searchResources("zone = 'east'")
      .orderBy("id").collect().map(_.toSeq).toSeq === beforeRes)
    assert(g2.metricsForResources(Seq("r1")) ===
      Map("r1" -> Seq(("cpu", "m1"))))
    // the reloaded catalog keeps accepting mutations (journal reopens
    // as a fresh segment)
    g2.createMetric("m2", "dur")
    val g3 = new Graft(s, root)
    assert(g3.hasMetric("m2"))
  }

  test("journal replay covers patch / delete-by-query / resource-type " +
      "ALTER / detach / metric deletion") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("dur2", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g1.createResourceType(ResourceType("vm",
      Seq(AttrSpec("zone", AttrType.Str(64)))))
    g1.setResources(Seq.empty[(String, String, String, java.sql.Timestamp)]
      .toDF("id", "type", "zone", "revision_start"))
    g1.setResourceHistory(
      Seq.empty[(String, String, String, java.sql.Timestamp,
        java.sql.Timestamp)]
        .toDF("id", "type", "zone", "revision_start", "revision_end"))
    // non-UUID ids uuid5-transform at the create door (ResourceUUID)
    val List(a1, a2, a3) = List("a1", "a2", "a3")
      .map(graft.catalog.ResourceUuid.transform(_, None))
    g1.createResource("vm", "a1", """{"zone": "east"}""")
    g1.createResource("vm", "a2", """{"zone": "east"}""")
    g1.createResource("vm", "a3", """{"zone": "west"}""")
    g1.patchResource(a1, Map("zone" -> "south"), nowS = 1420113600L)
    assert(g1.deleteResources("zone = 'west'") === 1L)
    // resource-type ALTER backfills both frames
    g1.patchResourceType("vm",
      add = Seq((AttrSpec("tier", AttrType.Str(16)), Some("std"))))
    g1.createMetric("d1", "dur2")
    g1.createMetric("d2", "dur2")
    g1.setMetrics(Seq(("d1", a1, "cpu"), ("d2", a2, "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    g1.replaceResourceMetrics(a2, Map.empty) // detach-all
    g1.deleteMetric("d2")

    val g2 = new Graft(s, root)
    val rows = g2.searchResources("id like '%'")
      .orderBy("id").collect()
    assert(rows.map(_.getAs[String]("id")).toSeq === Seq(a1, a2).sorted)
    val zoneById = rows.map(r =>
      r.getAs[String]("id") -> r.getAs[String]("zone")).toMap
    assert(zoneById === Map(a1 -> "south", a2 -> "east"))
    assert(rows.map(_.getAs[String]("tier")).toSeq === Seq("std", "std"))
    // the pre-patch revision survived into history
    val hist = g2.resourceHistory(a1).collect()
    assert(hist.exists(r => r.getAs[String]("zone") == "east"))
    assert(g2.resourceType("vm").attrs.map(_.name).contains("tier"))
    assert(!g2.hasMetric("d2"))
    assert(g2.hasMetric("d1"))
    assert(g2.metricsForResources(Seq(a1, a2)) ===
      Map(a1 -> Seq(("cpu", "d1"))))
  }

  test("explicit persistCatalog snapshots bulk-registered frames even " +
      "with no subsequent journaled mutation") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.setResources(Seq(("x1", "east"), ("x2", "west")).toDF("id", "zone"))
    g1.persistCatalog()
    val g2 = new Graft(s, root)
    assert(g2.searchResources("zone = 'east'").collect()
      .map(_.getAs[String]("id")).toSeq === Seq("x1"))
  }

  test("a reloaded catalog survives its own NEXT snapshot: frames " +
      "re-point to the new generation before the old one is deleted") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.setResources(Seq(("z1", "east")).toDF("id", "zone"))
    g1.persistCatalog() // gen 1
    g1.close() // g2 snapshots below — the writer lock must be free
    val g2 = new Graft(s, root) // resources ← gen_1 parquet
    assert(g2.searchResources("zone = 'east'").count() === 1L)
    // TWO rotations: deletion carries one generation of grace for
    // in-flight readers, so only the second would expose a stale gen_1
    // plan — the re-point after each snapshot keeps reads alive
    g2.persistCatalog() // gen 2
    g2.persistCatalog() // gen 3 — gen_1's files are gone now
    assert(g2.searchResources("zone = 'east'").count() === 1L)
    // and a third lifetime still loads cleanly
    val g3 = new Graft(s, root)
    assert(g3.searchResources("zone = 'east'").count() === 1L)
  }

  test("journal rotation: past the rotation bound a snapshot cuts " +
      "automatically and the reload replays snapshot + tail journal") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("rot", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    // 300 metric creates cross the 256-event rotation bound
    for (i <- 1 to 300) g1.createMetric(s"rot-$i", "rot")
    // the rotation cut a generation > 0
    val cat = java.nio.file.Paths.get(root, "_catalog")
    val gens = java.nio.file.Files.list(cat).iterator()
    var sawLaterGen = false
    while (gens.hasNext) {
      val n = gens.next().getFileName.toString
      if (n.startsWith("gen_") && n.stripPrefix("gen_").toInt >= 1)
        sawLaterGen = true
    }
    assert(sawLaterGen, "no rotated generation found")
    val g2 = new Graft(s, root)
    assert(g2.listMetrics.size === 300)
    assert(g2.hasMetric("rot-1") && g2.hasMetric("rot-300"))
  }

  test("rotation is cost-proportional (amortized doubling): N metric " +
      "creates cut O(log N) generations, not N/256") {
    val s = spark
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("amort", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    for (i <- 1 to 2000) g1.createMetric(s"am-$i", "amort")
    g1.close()
    // doubling cadence: rotations at ~256, ~513, ~1027 events → gen 3.
    // The old fixed-256 bound would have cut floor(2001/256) = 7.
    val mf = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_catalog", "MANIFEST")), "UTF-8")
    val gen = """"gen":\s*(\d+)""".r.findFirstMatchIn(mf).get.group(1).toInt
    assert(gen >= 2 && gen <= 4,
      s"expected O(log N) generations for 2000 creates, got $gen")
    val g2 = new Graft(s, root)
    assert(g2.listMetrics.size === 2000)
  }

  test("journal-only lifetime restarts cleanly: the first event cuts a " +
      "loadable generation-0 snapshot (no frames ever registered)") {
    val s = spark
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("j0", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g1.createMetric("jm1", "j0")
    // metric-only mode: no setResources, no persistCatalog, < rotation
    val g2 = new Graft(s, root)
    assert(g2.hasMetric("jm1"))
    assert(g2.metricPolicyName("jm1") === "j0")
  }

  test("a torn journal tail (crash mid-write) drops with a warning; " +
      "a missing MANIFEST recovers from the snapshot scan") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("tt", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g1.createMetric("t1", "tt")
    g1.createMetric("t2", "tt")
    g1.close() // free the writer lock; g2 persists below
    // simulate a kill -9 mid-append: a partial JSON line at the tail
    val seg = java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "_catalog")).iterator()
    var journal: Option[java.nio.file.Path] = None
    while (seg.hasNext) {
      val p = seg.next()
      if (p.getFileName.toString.startsWith("journal_")) journal = Some(p)
    }
    java.nio.file.Files.write(journal.get,
      """{"op":"metric_cre""".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val g2 = new Graft(s, root) // must not throw
    assert(g2.hasMetric("t1") && g2.hasMetric("t2"))
    // manifest loss (crash in the delete→rename window): recovery
    // scans for the newest complete generation
    g2.setResources(Seq(("m1r", "east")).toDF("id", "zone"))
    g2.persistCatalog()
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "_catalog", "MANIFEST"))
    val g3 = new Graft(s, root)
    assert(g3.hasMetric("t1"))
    assert(g3.searchResources("zone = 'east'").count() === 1L)
  }

  test("duplicate journal events (at-least-once semantics) replay as " +
      "skips: no crash, no duplicate catalog rows — across create, " +
      "attach, rule create/rename/delete, and policy delete") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("dup", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g1.createMetric("du1", "dup")
    g1.setMetrics(Seq.empty[(String, String, String)]
      .toDF("metric_id", "resource_id", "name"))
    g1.attachExistingMetrics(Seq(("du1", "dr1", "cpu")))
    g1.createResourceType(graft.catalog.ResourceTypes.ResourceType("vm2",
      Seq(AttrSpec("zone", AttrType.Str(64)))))
    // a full rule lifecycle + a policy deletion: their duplicates
    // replay as 404 skips (rule_create's as a 409 skip), not crashes
    g1.createPolicyRule("dupr", "du*", "dup")
    g1.renamePolicyRule("dupr", "dupr2")
    g1.deletePolicyRule("dupr2")
    g1.createPolicy(ArchivePolicy("gone", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g1.deletePolicy("gone")
    g1.createPolicyRule("kept", "du*", "dup")
    // duplicate every journaled event IN PLACE (a,a,b,b,…) — the
    // rotation-race shape is ONE event landing in both the snapshot
    // and the journal, i.e. adjacent re-application, not a replay of
    // the whole log twice
    val cat = java.nio.file.Paths.get(root, "_catalog")
    val segs = java.nio.file.Files.list(cat).iterator()
    while (segs.hasNext) {
      val p = segs.next()
      if (p.getFileName.toString.startsWith("journal_")) {
        val doubled = scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(p)).asScala
          .filter(_.nonEmpty).flatMap(l => Seq(l, l))
        java.nio.file.Files.write(p,
          (doubled.mkString("\n") + "\n").getBytes("UTF-8"))
      }
    }
    val g2 = new Graft(s, root) // must not throw on the duplicates
    assert(g2.hasMetric("du1"))
    assert(g2.metricsForResources(Seq("dr1")) ===
      Map("dr1" -> Seq(("cpu", "du1")))) // ONE attachment row, not two
    assert(g2.resourceType("vm2").attrs.map(_.name) === Seq("zone"))
    assert(g2.listPolicyRules.map(_._1) === Seq("kept"))
    assert(!g2.listPolicies.map(_.name).contains("gone"))
  }

  test("second writer facade on one root fails loudly (Conflict), " +
      "never corrupts; after the holder closes, a fresh facade writes") {
    val s = spark
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("lk", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g1.createMetric("lk1", "lk") // g1 now holds the writer lock
    val g2 = new Graft(s, root)  // constructing (read) is always fine
    assert(g2.hasMetric("lk1"))
    val e = intercept[graft.api.GraftError.Conflict](
      g2.createMetric("lk2", "lk"))
    assert(e.getMessage.contains("locked by another live writer"))
    g1.close()
    // the next WRITE of an already-open stale facade still fences on
    // the journal having advanced… here nothing advanced since g2
    // loaded except g1's own pre-load events, so a FRESH facade (the
    // documented recovery: reconstruct) writes cleanly
    val g3 = new Graft(s, root)
    g3.createMetric("lk3", "lk")
    g3.close()
    val g4 = new Graft(s, root)
    assert(g4.hasMetric("lk1") && g4.hasMetric("lk3"))
  }

  test("generation fence: a facade whose root ADVANCED since load " +
      "(another writer rotated) refuses to write instead of forking " +
      "history") {
    val s = spark
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("fence", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g1.createMetric("f1", "fence")
    g1.close()
    val g2 = new Graft(s, root) // loads generation 0
    val g1b = new Graft(s, root)
    g1b.persistCatalog() // rotates to generation 1
    g1b.close()
    val e = intercept[graft.api.GraftError.Conflict](
      g2.createMetric("f2", "fence"))
    assert(e.getMessage.contains("advanced since this facade loaded"))
    // a reconstructed facade sees the advanced state and writes fine
    val g3 = new Graft(s, root)
    g3.createMetric("f2", "fence")
    g3.close()
  }

  test("a stale lock from a provably dead process breaks with a " +
      "warning; a lock from an unverifiable owner refuses") {
    val s = spark
    val root = freshRoot
    val g0 = new Graft(s, root)
    g0.createPolicy(ArchivePolicy("stale", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g0.close()
    val host = java.net.InetAddress.getLocalHost.getHostName
    val lock = java.nio.file.Paths.get(root, "_catalog", "LOCK")
    // an UNVERIFIABLE owner: our own (live) pid under a foreign token —
    // exactly what a crashed-and-restarted writer can NOT look like
    java.nio.file.Files.write(lock,
      s"""{"token":"dead-beef","pid":${ProcessHandle.current().pid()},"host":"$host"}"""
        .getBytes("UTF-8"))
    val g1 = new Graft(s, root)
    val e = intercept[graft.api.GraftError.Conflict](
      g1.createMetric("s1", "stale"))
    assert(e.getMessage.contains("delete"))
    // a provably DEAD pid on this host: the lock breaks and the write
    // proceeds
    val deadPid = Iterator.from(999983)
      .find(p => !ProcessHandle.of(p.toLong).isPresent).get
    java.nio.file.Files.write(lock,
      s"""{"token":"dead-beef","pid":$deadPid,"host":"$host"}"""
        .getBytes("UTF-8"))
    g1.createMetric("s1", "stale")
    g1.close()
    val g2 = new Graft(s, root)
    assert(g2.hasMetric("s1"))
  }

  test("journalSync=force (fsync-per-event power-loss contract) " +
      "appends and reloads identically") {
    val s = spark
    val root = freshRoot
    s.conf.set("spark.graft.catalog.journalSync", "force")
    try {
      val g1 = new Graft(s, root)
      g1.createPolicy(ArchivePolicy("sync", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
        Set("mean")))
      g1.createMetric("sy1", "sync")
      g1.close()
      val g2 = new Graft(s, root)
      assert(g2.hasMetric("sy1"))
    } finally s.conf.unset("spark.graft.catalog.journalSync")
  }

  test("8 threads of journaled mutations through rotation boundaries " +
      "reload exactly-once: no lost creates, no duplicates, no deadlock") {
    val s = spark
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("mt", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    val perThread = 120 // 8*120 = 960 events → multiple rotations
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        try {
          var i = 0
          while (i < perThread) {
            g1.createMetric(s"mt-$t-$i", "mt")
            if (i % 7 == 0) g1.setMetricCreator(s"mt-$t-$i", s"u$t")
            if (i % 31 == 0) g1.createPolicyRule(s"r-$t-$i", s"mt-$t*", "mt")
            i += 1
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(threads.forall(!_.isAlive), "mutator threads deadlocked")
    assert(errs.isEmpty, s"mutators threw: ${errs.peek()}")
    g1.close()
    val g2 = new Graft(s, root)
    val metrics = g2.listMetrics.map(_._1).filter(_.startsWith("mt-"))
    assert(metrics.size === 8 * perThread) // exactly once, none lost
    assert(metrics.distinct.size === metrics.size)
    assert(g2.metricCreatorOf("mt-3-7") === Some("u3"))
    assert(g2.listPolicyRules.count(_._1.startsWith("r-")) ===
      8 * ((perThread + 30) / 31))
  }

  test("read-facade staleness: a long-lived reader reloads when ANOTHER " +
      "writer advances the catalog — plain appends AND a rotation") {
    val s = spark
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("rf", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g1.createMetric("rf1", "rf")
    g1.close()
    val reader = new Graft(s, root) // loads generation 0, never writes
    assert(reader.listMetrics.map(_._1).contains("rf1"))
    // a second-process writer appends WITHOUT rotating: the reader's
    // next read door must serve the new metric (the reference's API
    // workers read the CURRENT indexer state on every request,
    // sqlalchemy.py:1273-1402 — a reader pinned to its load-time
    // state would serve the dead catalog forever)
    val w = new Graft(s, root)
    w.createMetric("rf2", "rf")
    assert(reader.listMetrics.map(_._1).contains("rf2"))
    // … and across a ROTATION (manifest generation moves)
    w.createPolicyRule("rr", "rf*", "rf")
    w.persistCatalog()
    w.close()
    assert(reader.listPolicyRules.exists(_._1 == "rr"))
    assert(reader.listMetrics.map(_._1).toSet ==
      Set("rf1", "rf2"))
    reader.close()
  }

  test("staleness reload under concurrent readers: hooked doors never " +
      "throw while another facade appends and rotates under them") {
    val s = spark
    val root = freshRoot
    val g0 = new Graft(s, root)
    g0.createPolicy(ArchivePolicy("cc", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g0.createMetric("cc-seed", "cc")
    g0.close()
    val reader = new Graft(s, root)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (0 until 4).map { _ =>
      new Thread(() => {
        try while (!stop.get()) {
          reader.listMetrics; reader.listPolicies; reader.listPolicyRules
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    readers.foreach(_.start())
    // the writer keeps moving the on-disk catalog under the readers:
    // plain appends (journal bytes grow) and periodic rotations
    // (manifest generation moves) — every hooked read door races a
    // reload-in-flight at some point
    val w = new Graft(s, root)
    for (i <- 0 until 60) {
      w.createMetric(f"cc-$i%02d", "cc")
      if (i % 20 == 19) w.persistCatalog()
    }
    w.close()
    Thread.sleep(100) // let the readers observe the final state
    stop.set(true)
    readers.foreach(_.join(60000))
    assert(readers.forall(!_.isAlive), "reader thread hung")
    assert(errs.isEmpty, s"reader threw: ${errs.peek()}")
    assert(reader.listMetrics.map(_._1).count(_.startsWith("cc-")) == 61)
    reader.close()
  }

  test("staleness reload never discards locally registered frames: a " +
      "facade with a pending setResources keeps serving it") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    val g0 = new Graft(s, root)
    g0.createPolicy(ArchivePolicy("fd", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g0.close()
    val a = new Graft(s, root)
    a.setResources(Seq(("fd-r1", "east")).toDF("id", "zone")) // dirty, local
    val w = new Graft(s, root)
    w.createMetric("fd-m", "fd") // the catalog advances under A
    w.close()
    // A's read doors must NOT auto-reload (that would silently drop
    // the registered frame); the local view keeps serving
    assert(a.searchResources("zone = 'east'").count() == 1L)
    // …and A's next write is the documented loud Conflict (fence)
    intercept[graft.api.GraftError.Conflict](a.createMetric("fd-m2", "fd"))
  }

  test("staleness reload drops the MetricStore cache: a reader serves " +
      "measures under the OTHER writer's updated policy definition") {
    val s = spark
    val root = freshRoot
    val g1 = new Graft(s, root)
    g1.createPolicy(ArchivePolicy("sp", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None,
        Some(365L * 86400 * 1_000_000_000L))),
      Set("mean")))
    g1.createMetric("spm", "sp")
    g1.addMeasures("spm", Seq(
      ("2015-03-06 10:00:30", 1.0), ("2015-03-06 14:00:30", 2.0)))
    g1.process()
    g1.close()
    val reader = new Graft(s, root)
    assert(reader.getMeasures("spm", "mean").size == 2)
    // a second-process writer SHRINKS the retention timespan — the
    // definition lives in the policy, and the reader's cached
    // MetricStore was built from the old one; a reload that kept the
    // cache would keep serving the expired point
    val w = new Graft(s, root)
    w.updatePolicy("sp", Seq(ArchivePolicyItem(Granularity.seconds(60),
      None, Some(3600L * 1_000_000_000L))))
    // rotate so the update lives ONLY in the snapshot maps: a journal
    // replay of policy_update would invalidate the store entry through
    // the mutator anyway — the cache gap is specifically the
    // snapshot-loaded path
    w.persistCatalog()
    w.close()
    val got = reader.getMeasures("spm", "mean")
    assert(got.size == 1 && got.head._3 == 2.0,
      s"expected only the last point under the 1h timespan, got $got")
    reader.close()
  }

  test("writer-lock race on a fresh root: exactly one of 4 racing " +
      "facades wins (atomic O_EXCL create, -Dtest.iterations to stress)") {
    val s = spark
    val iters = Integer.getInteger("test.iterations", 5).intValue()
    for (k <- 0 until iters) {
      val root = freshRoot
      val wins = new java.util.concurrent.atomic.AtomicInteger
      val losses = new java.util.concurrent.atomic.AtomicInteger
      val others = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val facades = (0 until 4).map(_ => new Graft(s, root))
      val barrier = new java.util.concurrent.CyclicBarrier(4)
      val ts = facades.zipWithIndex.map { case (g, t) =>
        new Thread(() => {
          barrier.await()
          try { g.createMetric(s"race-$t", "low"); wins.incrementAndGet() }
          catch {
            case _: graft.api.GraftError.Conflict => losses.incrementAndGet()
            case e: Throwable => others.add(e)
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join(60000))
      assert(ts.forall(!_.isAlive), s"iter $k: racer deadlocked")
      assert(others.isEmpty, s"iter $k: unexpected ${others.peek()}")
      assert(wins.get() == 1, s"iter $k: ${wins.get()} writers won the lock")
      assert(losses.get() == 3, s"iter $k: ${losses.get()} conflicts")
      facades.foreach(_.close())
    }
  }

  test("crash-point fuzz: the journal truncated at 200+ byte offsets " +
      "always reloads a clean prefix and accepts new writes") {
    val s = spark
    val root = freshRoot
    val g = new Graft(s, root)
    g.createPolicy(ArchivePolicy("cz", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    for (i <- 0 until 8) g.createMetric(f"cz-$i%02d", "cz")
    g.persistCatalog() // rotation: generation 1, fresh journal
    for (i <- 8 until 48) g.createMetric(f"cz-$i%02d", "cz")
    g.close()
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val cat = Paths.get(root, "_catalog")
    def ls(): Seq[java.nio.file.Path] = {
      val st = Files.list(cat)
      try st.iterator().asScala.toVector finally st.close()
    }
    val journal = ls().find(
      _.getFileName.toString.startsWith("journal_")).get
    val pristine = Files.readAllBytes(journal)
    val manifest = Files.readAllBytes(cat.resolve("MANIFEST"))
    val snapshotMetrics = (0 until 8).map(i => f"cz-$i%02d").toSet
    // ≥200 crash points: every stride-spaced offset including 0 and
    // exact line boundaries — each truncation is a simulated kill at
    // that byte; the reload must recover EXACTLY the events the torn
    // journal still carries, then keep working as a writer
    val stride = math.max(1, pristine.length / 200)
    val offsets = (0 to pristine.length by stride) :+ pristine.length
    var points = 0
    for (k <- offsets.distinct.sorted) {
      // restore the pristine journal, drop residue from the last probe
      ls().filter { p =>
        val n = p.getFileName.toString
        n.startsWith("journal_") || n == "LOCK"
      }.foreach(p => Files.delete(p))
      Files.write(journal, pristine.take(k).toArray)
      Files.write(cat.resolve("MANIFEST"), manifest)
      val txt = new String(pristine.take(k).toArray, "UTF-8")
      val parts = txt.split("\n", -1)
      val fullLines = parts.dropRight(1).count(_.trim.nonEmpty)
      // a cut landing right after a line's closing '}' (before its \n)
      // leaves a PARSEABLE tail — the store replays it, exactly like a
      // write that made it to disk but died before the newline
      val tail = parts.last.trim
      val tailParses = tail.nonEmpty && (try {
        org.json4s.jackson.JsonMethods.parse(tail); true
      } catch { case _: Throwable => false })
      val recovered = fullLines + (if (tailParses) 1 else 0)
      val expected = snapshotMetrics ++
        (8 until 8 + recovered).map(i => f"cz-$i%02d")
      val r = new Graft(s, root)
      assert(r.listMetrics.map(_._1).filter(_.startsWith("cz-")).toSet ==
        expected, s"crash at byte $k of ${pristine.length}")
      r.createMetric(s"cz-new-$k", "cz") // the survivor must still write
      assert(r.hasMetric(s"cz-new-$k"))
      r.close()
      points += 1
    }
    assert(points >= 200, s"only $points crash points exercised")
  }

  test("snapshot crash windows: every intermediate on-disk state of a " +
      "rotation reloads the right generation and accepts writes") {
    val s = spark
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    // healthy base: gen 0 (implicit first-event snapshot) rotated to
    // gen 1 via persistCatalog, a few creates on each side
    val base = freshRoot
    val g = new Graft(s, base)
    g.createPolicy(ArchivePolicy("sc", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    for (i <- 0 until 4) g.createMetric(s"sc-$i", "sc")
    g.persistCatalog() // gen 1 commits; journal_1 fresh
    g.createMetric("sc-post", "sc")
    g.close()
    def copyTo(dst: String): Path = {
      val from = Paths.get(base); val to = Paths.get(dst)
      Files.walk(from).iterator().asScala.foreach { p =>
        val t = to.resolve(from.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else { Files.createDirectories(t.getParent); Files.copy(p, t) }
      }
      to.resolve("_catalog")
    }
    def assertHealthy(root: String, label: String): Unit = {
      val r = new Graft(s, root)
      val got = r.listMetrics.map(_._1).filter(_.startsWith("sc-")).toSet
      assert(got == (0 until 4).map(i => s"sc-$i").toSet + "sc-post", label)
      r.createMetric(s"sc-new", "sc") // survivor must still write
      assert(r.hasMetric("sc-new"), label)
      r.close()
    }
    // A: crash right after mkdirs of the NEXT gen dir (empty gen_2,
    // manifest still at 1) — the partial dir must be ignored
    val a = freshRoot; val ca = copyTo(a)
    Files.createDirectories(ca.resolve("gen_2"))
    assertHealthy(a, "A: empty next-gen dir")
    // B: crash after the next gen's maps.json is written but BEFORE
    // the manifest flips — still gen 1's world
    val b = freshRoot; val cb = copyTo(b)
    Files.createDirectories(cb.resolve("gen_2"))
    Files.copy(cb.resolve("gen_1/maps.json"), cb.resolve("gen_2/maps.json"))
    assertHealthy(b, "B: unflipped complete next gen")
    // C: crash INSIDE writeManifest's delete->rename window — MANIFEST
    // gone, MANIFEST.tmp carries the new gen, gen_1 complete. The
    // snapshot-scan recovery must pick the highest COMPLETE generation
    // and rewrite the manifest
    val c = freshRoot; val cc = copyTo(c)
    Files.move(cc.resolve("MANIFEST"), cc.resolve("MANIFEST.tmp"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assertHealthy(c, "C: manifest-less delete->rename window")
    assert(Files.exists(cc.resolve("MANIFEST")),
      "C: recovery must republish the manifest")
    // D: crash after the flip but before old-generation cleanup — a
    // stale gen_0 directory lingers alongside the committed gen_1
    val d = freshRoot; val cd = copyTo(d)
    Files.createDirectories(cd.resolve("gen_0"))
    Files.copy(cd.resolve("gen_1/maps.json"), cd.resolve("gen_0/maps.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assertHealthy(d, "D: lingering superseded generation")
  }

  test("a fresh root stays write-free until the first catalog mutation") {
    val s = spark
    import s.implicits._
    val root = freshRoot
    val g = new Graft(s, root)
    g.setResources(Seq(("y1", "east")).toDF("id", "zone"))
    g.searchResources("zone = 'east'").collect()
    // read-only workloads (bench query setup) must not pay catalog IO
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_catalog", "MANIFEST")))
  }
}
