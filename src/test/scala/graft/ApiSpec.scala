package graft

import java.nio.file.Files
import graft.api.Graft
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}
import graft.query.MeasureSearch

/** End-to-end minimum slice (SURVEY §7.2), mirroring the reference's
  * gabbi scenario tests/functional/gabbits/aggregation.yaml:10-120.
  */
class ApiSpec extends SparkSpec {

  private def freshGraft(): Graft = {
    val dir = Files.createTempDirectory("graft-api").toString
    val g = new Graft(spark, dir)
    // policy low' = {1 s, 300 s} like the gabbi scenario
    g.createPolicy(ArchivePolicy("gabbi-low", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(1), None, None),
          ArchivePolicyItem(Granularity.seconds(300), None, None)),
      Set("mean", "max", "sum")))
    g
  }

  test("minimum slice: policy -> metric -> measures -> job -> triples") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.addMeasures("m1", Seq(
      ("2015-03-06 14:33:57", 43.1), ("2015-03-06 14:34:12", 12.0)))
    g.process()
    val got = g.getMeasures("m1", "mean")
      .map { case (t, gr, v) => (t.toString, gr, math.rint(v * 100) / 100) }
    assert(got == Seq(
      ("2015-03-06 14:30:00.0", 300L, 27.55), // coarse first
      ("2015-03-06 14:33:57.0", 1L, 43.1),
      ("2015-03-06 14:34:12.0", 1L, 12.0)))
  }

  test("cross-metric aggregate mean over two metrics (aggregation.yaml)") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.createMetric("m2", "gabbi-low")
    g.addMeasures("m1", Seq(
      ("2015-03-06 14:33:57", 43.1), ("2015-03-06 14:34:12", 12.0)))
    g.addMeasures("m2", Seq(
      ("2015-03-06 14:33:57", 3.1), ("2015-03-06 14:34:12", 2.0),
      ("2015-03-06 14:35:12", 5.0)))
    g.process()
    val out = g.aggregates(
      "(aggregate mean (metric (m1 mean) (m2 mean)))", 300)
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(0).toString, math.rint(r.getDouble(1) * 1000) / 1000))
    // 14:30 bucket: m1 mean = 27.55, m2 mean = 2.55 → 15.05; 14:35: m2 only → 5.0
    assert(out.toSeq == Seq(
      ("2015-03-06 14:30:00.0", 15.05), ("2015-03-06 14:35:00.0", 5.0)))
  }

  test("P6 output shaping: aggregates collect to the reference triple form " +
      "(processor.py:229-272)") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.addMeasures("m1", Seq(
      ("2015-03-06 14:33:57", 43.1), ("2015-03-06 14:34:12", 12.0)))
    g.process()
    val shaped = g.shaped(g.aggregates("(metric m1 mean)", 300), 300)
    // same triples a direct single-metric read produces at that gran
    assert(shaped == g.getMeasures("m1", "mean", Some(300)))
    assert(shaped.map(_._2).distinct == Seq(300L))
  }

  test("expression with scalar + rolling (metric-derived style)") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.addMeasures("m1", Seq(
      ("2015-03-06 14:30:01", 1.0), ("2015-03-06 14:35:01", 2.0),
      ("2015-03-06 14:40:01", 3.0), ("2015-03-06 14:45:01", 4.0)))
    g.process()
    val out = g.aggregates("(* 4 (rolling sum 2 (metric m1 max)))", 300)
      .orderBy("bucket").collect().map(_.getDouble(1)).toSeq
    assert(out == Seq(12.0, 20.0, 28.0)) // 4*(1+2), 4*(2+3), 4*(3+4)
  }

  test("batch measures: auto-create via rules, unknown 400s, policy update") {
    val s = spark
    import s.implicits._
    val g = freshGraft()
    g.createPolicyRule("*", "gabbi-low")
    g.createMetric("m-cpu", "gabbi-low")
    g.setMetrics(Seq(("m-cpu", "r1", "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    // unknown metric without create_metrics → the reference's 400
    val e = intercept[IllegalArgumentException](g.batchAddMeasures(
      """{"r1": {"mem": [{"timestamp": "2015-03-06T14:33:57", "value": 2}]}}"""))
    assert(e.getMessage.contains("r1/mem"))
    // with create_metrics: rules pick the policy; catalog gains the row
    // NB the timestamp FORMAT is fixed per list by its first element
    // (utils.to_timestamps:86-123) — a mixed ISO+epoch list is a 400
    g.batchAddMeasures(
      """{"r1": {"cpu": [{"timestamp": "2015-03-06T14:33:57", "value": 43.1},
                         {"timestamp": "2015-03-06T14:34:12", "value": 12}],
                 "mem": {"archive_policy_name": "gabbi-low",
                         "measures": [{"timestamp": "2015-03-06T14:33:57",
                                       "value": 2.0}]}}}""",
      createMetrics = true)
    val eMix = intercept[IllegalArgumentException](g.batchAddMeasures(
      """{"r1": {"cpu": [{"timestamp": "2015-03-06T14:33:57", "value": 1},
                         {"timestamp": 1425652452, "value": 2}]}}"""))
    assert(eMix.getMessage.contains("mixed timestamp formats"))
    g.process()
    assert(g.getMeasures("m-cpu", "mean", granS = Some(300))
      .map(_._3) == Seq(27.55))
    assert(g.getMeasures("r1/mem", "mean", granS = Some(300))
      .map(_._3) == Seq(2.0))
    // capabilities expose the closed kernel set + rate: variants
    assert(g.capabilities.contains("mean") && g.capabilities.contains("rate:mean"))
    // policy update: timespan may change, granularity may not
    import graft.model.{ArchivePolicyItem, Granularity}
    g.updatePolicy("gabbi-low", Seq(
      ArchivePolicyItem(Granularity.seconds(1), Some(100L), None),
      ArchivePolicyItem(Granularity.seconds(300), Some(12L), None)))
    assert(g.policies("gabbi-low").definition.flatMap(_.points) ==
      Seq(100L, 12L))
    val e2 = intercept[IllegalArgumentException](g.updatePolicy("gabbi-low",
      Seq(ArchivePolicyItem(Granularity.seconds(2), None, None),
        ArchivePolicyItem(Granularity.seconds(300), None, None))))
    assert(e2.getMessage.contains("granularity"))
    val e3 = intercept[IllegalArgumentException](g.updatePolicy("gabbi-low",
      Seq(ArchivePolicyItem(Granularity.seconds(1), None, None))))
    assert(e3.getMessage.contains("add or drop"))
  }

  test("aggregates start/stop: from floored to granularity, to inclusive") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.addMeasures("m1", Seq(
      ("2015-03-06 14:30:01", 1.0), ("2015-03-06 14:35:01", 2.0),
      ("2015-03-06 14:40:01", 3.0), ("2015-03-06 14:45:01", 4.0)))
    g.process()
    val out = g.aggregates("(metric m1 mean)", 300,
        from = Some(java.sql.Timestamp.valueOf("2015-03-06 14:36:00")),
        to = Some(java.sql.Timestamp.valueOf("2015-03-06 14:44:00")))
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toSeq
    // carbonara fetch slices [floor(from, g), to] — 14:36 → 14:35 bucket
    assert(out == Seq(
      ("2015-03-06 14:35:00.0", 2.0), ("2015-03-06 14:40:00.0", 3.0)))
  }

  test("read-your-writes refresh (rest/api.py:539-547)") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.addMeasures("m1", Seq(("2015-03-06 14:33:57", 10.0)))
    // no process() — refresh inline
    val got = g.getMeasures("m1", "mean", granS = Some(300), refreshFirst = true)
    assert(got.map(_._3) == Seq(10.0))
  }

  test("calendar resample through the facade (resample-calendar.yaml)") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.addMeasures("m1", Seq(
      ("2015-03-06 14:33:57", 43.1), ("2015-03-06 14:34:12", 12.0),
      ("2015-04-10 00:00:00", 30.0)))
    g.process()
    val got = g.getMeasures("m1", "mean", granS = Some(300),
      resample = Some(Granularity.Calendar("M")))
    assert(got.map { case (t, _, v) => (t.toString.take(10), v) } ==
      Seq(("2015-03-01", 27.55), ("2015-04-01", 30.0)))
  }

  test("P1 planning: common granularities, no-match and bad-method errors") {
    val g = freshGraft()
    g.createPolicy(ArchivePolicy("coarse-only", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(300), None, None)),
      Set("mean")))
    g.createPolicy(ArchivePolicy("fine-only", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(1), None, None)),
      Set("mean")))
    g.createMetric("m1", "gabbi-low")
    g.createMetric("m2", "coarse-only")
    g.createMetric("m3", "fine-only")
    assert(g.commonGranularities(Seq("m1", "m2")) == Seq(300L))
    val e1 = intercept[IllegalArgumentException](
      g.commonGranularities(Seq("m2", "m3")))
    assert(e1.getMessage.contains("No granularity match"))
    g.addMeasures("m1", Seq(("2015-03-06 14:33:57", 2.0)))
    g.process()
    // auto granularity: one result row per common granularity
    val auto = g.aggregatesAuto("(* 2 (metric m1 mean))")
      .select("gran_s").collect().map(_.getLong(0)).toSeq
    assert(auto == Seq(300L, 1L)) // coarse first
    val e2 = intercept[IllegalArgumentException](
      g.aggregates("(metric m1 median)", 300))
    assert(e2.getMessage.contains("does not exist"))
  }

  test("P5 facade contract: default dropna, needed_overlap trims or errors") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.createMetric("m2", "gabbi-low")
    g.addMeasures("m1", Seq(("2015-03-06 14:30:00", 1.0),
      ("2015-03-06 14:35:00", 2.0), ("2015-03-06 14:40:00", 3.0)))
    g.addMeasures("m2", Seq(("2015-03-06 14:35:00", 10.0)))
    g.process()
    // fill = dropna: only the overlapping bucket survives
    val got = g.aggregates("(+ (metric m1 mean) (metric m2 mean))", 300,
        fill = Some("dropna"))
      .collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(12.0))
    // from/to unset -> grid trims to the overlapping span, so even
    // needed_overlap=100 passes on a partially-overlapping grid
    val ok = g.aggregates("(+ (metric m1 mean) (metric m2 mean))", 300,
        neededOverlap = Some(100.0))
      .collect().map(_.getDouble(1)).toSeq
    assert(ok == Seq(12.0))
    // zero overlap anywhere: UnAggregableTimeseries analogue
    g.createMetric("m3", "gabbi-low")
    g.addMeasures("m3", Seq(("2015-03-07 00:00:00", 5.0)))
    g.process()
    val e = intercept[IllegalArgumentException](
      g.aggregates("(+ (metric m1 mean) (metric m3 mean))", 300,
        neededOverlap = Some(100.0)).collect())
    assert(e.getMessage.contains("Unable to aggregate"))
  }

  test("dropna: NaN-skipping eval, output-stage drop " +
      "(processor.py:173-175, 237-244)") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.createMetric("m2", "gabbi-low")
    g.addMeasures("m1", Seq(("2015-03-06 14:30:00", 1.0),
      ("2015-03-06 14:35:00", 2.0), ("2015-03-06 14:40:00", 3.0)))
    g.addMeasures("m2", Seq(("2015-03-06 14:35:00", 10.0),
      ("2015-03-06 14:40:00", 0.0)))
    g.process()
    // aggregate-across must see PARTIAL buckets (the reference's dropna
    // grid keeps its NaN filler through evaluation; nan-aggs skip) —
    // a grid-level row filter would lose b1 and b3 entirely
    val sums = g.aggregates(
        "(aggregate sum (metric (m1 mean) (m2 mean)))", 300,
        fill = Some("dropna"))
      .orderBy("bucket").collect().map(_.getDouble(1)).toSeq
    assert(sums == Seq(1.0, 12.0, 3.0))
    // output drop: missing cell (b1: 1/na) AND ±inf (b3: 3/0 under
    // numpy true_divide) both vanish from the emitted measures
    val ratio = g.aggregates(
        "(/ (metric m1 mean) (metric m2 mean))", 300,
        fill = Some("dropna"))
      .orderBy("bucket").collect().map(_.getDouble(1)).toSeq
    assert(ratio == Seq(0.2))
  }

  test("resource-scoped group-by aggregation (G1/G2) via metric catalog") {
    val s = spark
    import s.implicits._
    val g = freshGraft()
    for (m <- Seq("cpu1", "cpu2", "cpu3")) g.createMetric(m, "gabbi-low")
    g.addMeasures("cpu1", Seq(("2015-03-06 14:33:00", 10.0)))
    g.addMeasures("cpu2", Seq(("2015-03-06 14:33:30", 30.0)))
    g.addMeasures("cpu3", Seq(("2015-03-06 14:33:59", 100.0)))
    g.process()
    g.setResources(Seq(("r1", "east"), ("r2", "east"), ("r3", "west"))
      .toDF("id", "zone"))
    g.setMetrics(Seq(("cpu1", "r1", "cpu.util"), ("cpu2", "r2", "cpu.util"),
      ("cpu3", "r3", "cpu.util")).toDF("metric_id", "resource_id", "name"))
    val got = g.groupByAggregates("cpu.*", "mean", 300,
        filterStr = "zone in [\"east\", \"west\"]", groupby = Seq("zone"))
      .orderBy("zone").collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(got == Seq(("east", 20.0), ("west", 100.0)))
    // filter scoping: only west resources
    val west = g.groupByAggregates("cpu.*", "mean", 300,
        filterStr = "zone = \"west\"", groupby = Seq("zone"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(west == Seq(("west", 100.0)))
  }

  test("catalog lineage compacts under sustained row CRUD") {
    val sp = spark
    import sp.implicits._
    val g = freshGraft()
    g.setResources(Seq(("r1", "fr", 0.0)).toDF("id", "zone", "weight"))
    // 80 mutations: without periodic compaction the catalog plan is an
    // 80-deep filter/union chain; with it, lineage resets every 32
    for (i <- 1 to 80)
      g.patchResource("r1", Map("weight" -> i.toDouble), nowS = 1000L + i)
    val got = g.searchResources("id = 'r1'").select("weight")
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(80.0))
    val planNodes = g.searchResources("id = 'r1'")
      .queryExecution.analyzed.collect { case n => n }.size
    assert(planNodes < 100, s"catalog lineage grew to $planNodes nodes")
    // metric-attachment churn stacks a union per attach on the metrics
    // catalog — the same periodic cut must bound it
    for (i <- 1 to 40)
      g.attachMetrics(s"res-$i", Seq(s"m$i" -> Some("gabbi-low")))
    assert(g.resourceMetrics("res-40") == Seq((s"m40", "res-40/m40")))
    val metNodes = g.metricsCatalog.get
      .queryExecution.analyzed.collect { case n => n }.size
    assert(metNodes < 60, s"metrics-catalog lineage grew to $metNodes nodes")
  }

  test("R9 policy rules: longest glob wins; R8 delete-by-query counts") {
    val s = spark
    import s.implicits._
    val g = freshGraft()
    g.createPolicyRule("*", "gabbi-low")
    g.createPolicyRule("disk.*", "gabbi-low")
    val e = intercept[IllegalArgumentException](g.createPolicyRule("x", "nope"))
    assert(e.getMessage.contains("Archive policy nope does not exist"))
    g.createMetric("disk.io.read") // matches both; longest pattern wins
    g.createMetric("cpu.util")     // matches "*"
    g.addMeasures("disk.io.read", Seq(("2015-03-06 14:33:57", 1.0)))
    g.process()
    assert(g.getMeasures("disk.io.read", "mean").nonEmpty)
    g.setResources(Seq(("r1", "east"), ("r2", "west"), ("r3", "west"))
      .toDF("id", "zone"))
    assert(g.deleteResources("zone = \"west\"") == 2L)
    assert(g.searchResources("zone = \"east\"").count() == 1L)
    assert(g.searchResources("zone = \"west\"").count() == 0L)
  }

  test("value-threshold search across metrics (S1)") {
    val g = freshGraft()
    g.createMetric("m1", "gabbi-low")
    g.createMetric("m2", "gabbi-low")
    g.addMeasures("m1", Seq(("2015-03-06 14:33:57", 100.0)))
    g.addMeasures("m2", Seq(("2015-03-06 14:33:57", 5.0)))
    g.process()
    import MeasureSearch._
    val got = g.searchMetricValues(Seq("m1", "m2"), "mean", 300,
      Cmp(">", Arith("*", Value, Const(2)), Const(50)))
      .select("metric_id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("m1"))
    // python operator.mod semantics: -5 % 3 == 1 (sign of the divisor)
    g.createMetric("m3", "gabbi-low")
    g.addMeasures("m3", Seq(("2015-03-06 14:33:57", -5.0)))
    g.process()
    val modGot = g.searchMetricValues(Seq("m3"), "mean", 300,
      Cmp("=", Arith("%", Value, Const(3)), Const(1)))
      .select("metric_id").collect().map(_.getString(0)).toSeq
    assert(modGot == Seq("m3"))
    // a zero divisor must not abort the scan (ANSI `/` throws):
    // Value/0 = NaN, and NaN orders above every double in both Spark
    // and the oracle, so `> 50` deterministically matches
    val divGot = g.searchMetricValues(Seq("m3"), "mean", 300,
      Cmp(">", Arith("/", Value, Const(0)), Const(50)))
      .select("metric_id").collect().map(_.getString(0)).toSeq
    assert(divGot == Seq("m3"))
  }

  test("S1 search over a calendar-only policy with no ?granularity " +
      "serves the EMPTY frame, not an uncaught reduce-on-Nil 500") {
    val g = freshGraft()
    g.createPolicy(graft.model.ArchivePolicy("calonly", 0,
      Seq(graft.model.ArchivePolicyItem(
        graft.model.Granularity.parse("M"), None, None)),
      Set("mean")))
    // a calendar-only policy is catalogable but NOT storable
    // (MetricStore requires one fixed granularity) — the search door
    // still must not 500 on the metric's zero fixed granularities
    g.createMetric("cal1", "calonly")
    import MeasureSearch._
    val got = g.searchMetricValuesMulti(Seq("cal1"), "mean", None,
      Cmp(">", Value, Const(0)))
    assert(got.columns.toSeq == Seq("metric_id", "bucket", "value"))
    assert(got.count() == 0L)
    // …and an EXPLICIT fixed granularity the policy never stored is
    // still the structured AggregationDoesNotExist 400
    val e = intercept[IllegalArgumentException](
      g.searchMetricValuesMulti(Seq("cal1"), "mean", Some(Seq(300L)),
        Cmp(">", Value, Const(0))).collect())
    assert(e.getMessage.contains("Aggregation does not exist"))
    // the zero-metric search is the same empty frame
    assert(g.searchMetricValuesMulti(Nil, "mean", None,
      Cmp(">", Value, Const(0))).count() == 0L)
  }

  test("resourceColumns on a bare facade serves the base schema " +
      "WITHOUT registering frames (a GET must stay a pure read)") {
    val s = spark
    val root = Files.createTempDirectory("graft-rocols").toString
    val g = new Graft(s, root)
    assert(g.resourceColumns.contains("started_at"))
    assert(g.resourceColumns.contains("project_id"))
    // no frame registration happened: the facade is still bare and
    // close() must not snapshot (no catalog writes from a pure read)
    assert(!g.hasResourceTable)
    g.close()
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "_catalog")))
  }

  test("use_history group-by: revision windows weight buckets fractionally " +
      "(rest/aggregates/api.py:191-493)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-api").toString
    val g = new Graft(spark, dir)
    g.createMetric("m1", "medium") // 60 s granularity
    g.setMetrics(Seq(("m1", "r1", "cpu.util"))
      .toDF("metric_id", "resource_id", "name"))
    g.setResourceHistory(Seq(
      // r1 is flavor 'a' until 12:01:30, then 'b' (open revision)
      ("r1", "a", ts("2024-01-01 11:00:00"), Some(ts("2024-01-01 12:01:30"))),
      ("r1", "b", ts("2024-01-01 12:01:30"), Option.empty[java.sql.Timestamp]))
      .toDF("id", "flavor", "revision_start", "revision_end"))
    g.addMeasures("m1", Seq(
      ("2024-01-01 12:00:10", 2.0), ("2024-01-01 12:00:50", 4.0), // mean 3
      ("2024-01-01 12:01:10", 6.0),                               // mean 6
      ("2024-01-01 12:02:30", 8.0)))                              // mean 8
    g.process()
    val got = g.groupByAggregatesHistory("cpu.*", "mean", 60,
        "id = \"r1\"", "flavor")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    val t0 = ts("2024-01-01 12:00:00").getTime / 1000
    // bucket 12:01 straddles the revision edge: 30 s to 'a', 30 s to 'b'
    assert(got == Map(
      (("a", t0), 3.0), (("a", t0 + 60), 3.0),
      (("b", t0 + 60), 3.0), (("b", t0 + 120), 8.0)))
  }

  test("generalized use_history: query-window clamping weights the " +
      "edge bucket fractionally and the FIRST revision reaches back " +
      "to the query start (truncate_resource_time_window, " +
      "rest/aggregates/api.py:356-381)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-api").toString
    val g = new Graft(spark, dir)
    g.createMetric("m1", "medium") // 60 s granularity
    g.setMetrics(Seq(("m1", "r1", "cpu.util"))
      .toDF("metric_id", "resource_id", "name"))
    // first KNOWN revision starts at 12:01 — but measures exist from
    // 12:00, and the reference assigns them to the first revision
    g.setResourceHistory(Seq(
      ("r1", "a", ts("2024-01-01 12:01:00"), Some(ts("2024-01-01 12:02:00"))),
      ("r1", "b", ts("2024-01-01 12:02:00"), Option.empty[java.sql.Timestamp]))
      .toDF("id", "flavor", "revision_start", "revision_end"))
    g.addMeasures("m1", Seq(
      ("2024-01-01 12:00:30", 2.0),   // bucket 12:00 — before rev 1 starts
      ("2024-01-01 12:01:30", 4.0),   // bucket 12:01 — inside rev 1
      ("2024-01-01 12:02:30", 8.0)))  // bucket 12:02 — rev 2
    g.process()
    val t0 = ts("2024-01-01 12:00:00").getTime / 1000
    def run(from: Option[java.sql.Timestamp],
            to: Option[java.sql.Timestamp]) =
      g.groupByAggregatesHistoryOps(
          "(aggregate mean (metric cpu.* mean))", 60, "id = \"r1\"",
          Seq("flavor"), None, from, to)
        .collect().map(r => ((r.getString(0),
          r.getAs[java.sql.Timestamp]("bucket").getTime / 1000),
          r.getAs[Double]("value"))).toMap
    // no window: bucket 12:00 belongs to FIRST revision 'a' (reach-back)
    assert(run(None, None) == Map(
      (("a", t0), 2.0), (("a", t0 + 60), 4.0), (("b", t0 + 120), 8.0)))
    // from=12:00:30 clamps every window: bucket 12:00 overlaps the
    // query by 30/60 s -> coefficient 0.5 (Measure.usage_coefficient,
    // api.py:244-259); later buckets are whole
    assert(run(Some(ts("2024-01-01 12:00:30")), None) == Map(
      (("a", t0), 1.0), (("a", t0 + 60), 4.0), (("b", t0 + 120), 8.0)))
    // to=12:02:30 clamps the tail: bucket 12:02 gets coefficient 0.5
    assert(run(None, Some(ts("2024-01-01 12:02:30")))
      .apply(("b", t0 + 120)) == 4.0)
  }

  test("a failed drain re-stages the snapshot: 202-accepted measures " +
      "survive a store-write failure and land on retry") {
    val dir = Files.createTempDirectory("graft-durable").toString
    val g = new Graft(spark, dir)
    g.createPolicy(ArchivePolicy("dur", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    g.createMetric("m", "dur")
    g.addMeasures("m", Seq(("2014-01-01 12:00:01", 7.0)))
    // hold m's SACK lock so the drain's store write fails loudly
    // (no wait: the posture under test is the failure, not the queue)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(
      s"$dir/dur/.lock.sack.${graft.ingest.MetricStore.sackOfId("m")}")
    fs.mkdirs(lock.getParent)
    fs.create(lock, false).close()
    spark.conf.set("spark.graft.ingest.lockWaitMs", "0")
    try intercept[IllegalStateException](g.process())
    finally spark.conf.unset("spark.graft.ingest.lockWaitMs")
    assert(g.status().getOrElse("m", 0L) === 1L,
      "failed drain lost the staged measure")
    fs.delete(lock, false)
    g.process()
    assert(g.status().isEmpty)
    assert(g.getMeasures("m", "mean").map(_._3) === Seq(7.0))
  }

  test("deleteResources: NULL-predicate rows survive and are not " +
      "counted (SQL DELETE three-valued logic)") {
    val s = spark
    import s.implicits._
    val g = freshGraft()
    g.setResources(Seq(("r1", "m1"), ("r2", null), ("r3", "m2"))
      .toDF("id", "flavor"))
    assert(g.deleteResources("flavor = 'm1'") === 1L)
    assert(g.searchResources("id != null").select("id")
      .collect().map(_.getString(0)).toSet === Set("r2", "r3"))
  }

  test("attachMetrics is all-or-nothing when a derived id collides " +
      "with an independently created metric") {
    val g = freshGraft()
    val s = spark
    import s.implicits._
    g.setResources(Seq(("res1", "x")).toDF("id", "zone"))
    g.createMetric("res1/cpu", "gabbi-low")
    val e = intercept[graft.api.GraftError.Conflict](
      g.attachMetricsSchema("res1", Map(
        "apples" -> Right(Some("gabbi-low")),
        "cpu" -> Right(Some("gabbi-low")))))
    assert(e.getMessage.contains("res1/cpu"))
    assert(!g.hasMetric("res1/apples"),
      "partial creation: apples was created before the cpu conflict")
  }

  test("deleteMetric forgets the resource-attachment catalog row") {
    val g = freshGraft()
    val s = spark
    import s.implicits._
    g.setResources(Seq(("r9", "x")).toDF("id", "zone"))
    g.attachMetricsSchema("r9", Map("cpu" -> Right(Some("gabbi-low"))))
    assert(g.resourceMetrics("r9").map(_._1) === Seq("cpu"))
    g.deleteMetric("r9/cpu")
    assert(g.resourceMetrics("r9").isEmpty,
      "dangling catalog row after metric delete")
  }

  test("hundreds of staged bulk batches stay analyzable (balanced " +
      "union, not a left-deep chain)") {
    val g = freshGraft()
    val s = spark
    import s.implicits._
    g.createMetric("bk", "gabbi-low")
    for (i <- 1 to 200)
      g.batchAddMeasures(Seq(
        ("bk", java.sql.Timestamp.valueOf(f"2014-01-01 12:00:${i % 60}%02d"), i.toDouble))
        .toDF("metric_id", "timestamp", "value"))
    assert(g.status()("bk") === 200L)
    g.process()
    assert(g.getMeasures("bk", "mean", Some(300)).nonEmpty)
  }

  test("legacy aggregation guards the per-group planning fan-out " +
      "(spark.graft.aggregation.maxGroups)") {
    val g = freshGraft()
    val s = spark
    import s.implicits._
    for (i <- 1 to 3) g.createMetric(s"fan$i", "gabbi-low")
    g.setResources((1 to 3).map(i => (s"fr$i", s"zone$i")).toDF("id", "zone"))
    g.setMetrics((1 to 3).map(i => (s"fan$i", s"fr$i", "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    s.conf.set("spark.graft.aggregation.maxGroups", "2")
    try {
      val e = intercept[IllegalArgumentException](
        g.legacyResourceAggregation("cpu", "mean", Some(300L),
          g.searchResources("id like '%'"), Seq("zone")).collect())
      assert(e.getMessage.contains("maxGroups"))
      // under the cap: plans fine (3 groups → 1 group key set of 1)
      assert(g.legacyResourceAggregation("cpu", "mean", Some(300L),
        g.searchResources("zone = 'zone1'"), Seq("zone")).collect() != null)
    } finally s.conf.unset("spark.graft.aggregation.maxGroups")
  }
}
