package graft

import java.nio.file.Files
import graft.api.Graft
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}

/** Resource-grouped nested-DSL evaluation
  * (rest/aggregates/api.py:191-493 groupby × operations grammar):
  * metric leaves expand per resource in each group, aggregate nodes
  * collapse the variable metric axis, and the surrounding scalar tree
  * evaluates per group. Goldens hand-computed.
  */
class GroupedOpsSpec extends SparkSpec {

  // two 300 s buckets: B1 = 14:30, B2 = 14:35
  private def fleet(): Graft = {
    val dir = Files.createTempDirectory("graft-gops").toString
    val g = new Graft(spark, dir)
    g.createPolicy(ArchivePolicy("low", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(300), None, None)),
      Set("mean", "max", "sum")))
    for (m <- Seq("u1", "u2", "u3", "t1", "t2", "t3")) g.createMetric(m, "low")
    g.addMeasures("u1", Seq(("2015-03-06 14:33:00", 10.0), ("2015-03-06 14:36:00", 20.0)))
    g.addMeasures("u2", Seq(("2015-03-06 14:33:10", 30.0), ("2015-03-06 14:36:10", 40.0)))
    g.addMeasures("u3", Seq(("2015-03-06 14:33:20", 50.0), ("2015-03-06 14:36:20", 60.0)))
    g.addMeasures("t1", Seq(("2015-03-06 14:33:00", 100.0), ("2015-03-06 14:36:00", 100.0)))
    g.addMeasures("t2", Seq(("2015-03-06 14:33:10", 100.0), ("2015-03-06 14:36:10", 100.0)))
    g.addMeasures("t3", Seq(("2015-03-06 14:33:20", 200.0), ("2015-03-06 14:36:20", 200.0)))
    g.process()
    val s = spark
    import s.implicits._
    g.setResources(Seq(("r1", "east"), ("r2", "east"), ("r3", "west"))
      .toDF("id", "zone"))
    g.setMetrics(Seq(
      ("u1", "r1", "mem.used"), ("u2", "r2", "mem.used"), ("u3", "r3", "mem.used"),
      ("t1", "r1", "mem.total"), ("t2", "r2", "mem.total"), ("t3", "r3", "mem.total"))
      .toDF("metric_id", "resource_id", "name"))
    g
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Double)] =
    df.orderBy("zone", "bucket").collect().toSeq.map(r =>
      (r.getString(0), r.getTimestamp(1).toString,
        math.rint(r.getDouble(2) * 1000) / 1000))

  test("percent-of-total ratio of two aggregates, per zone") {
    val got = rows(fleet().groupByAggregatesOps(
      "(* 100 (/ (aggregate sum (metric mem.used mean)) " +
        "(aggregate sum (metric mem.total mean))))",
      300, "zone in [\"east\", \"west\"]", Seq("zone")))
    // east B1: 100*(10+30)/(100+100)=20; B2: 100*(20+40)/200=30
    // west B1: 100*50/200=25;            B2: 100*60/200=30
    assert(got == Seq(
      ("east", "2015-03-06 14:30:00.0", 20.0),
      ("east", "2015-03-06 14:35:00.0", 30.0),
      ("west", "2015-03-06 14:30:00.0", 25.0),
      ("west", "2015-03-06 14:35:00.0", 30.0)))
  }

  test("a ref repeated inside one metric leaf DEDUPES at extraction: " +
      "the reference's ReferencesList is an OrderedSet " +
      "(rest/aggregates/api.py:142-152) and evaluate() selects each " +
      "matching column once (operations.py:356-360)") {
    // sum leaf: the duplicate collapses — east B1 = 10+30 = 40, same
    // as the single-ref form (the gabbi pins this: "we put metric2
    // twice to ensure we retrieve it once")
    val dup = rows(fleet().groupByAggregatesOps(
      "(aggregate sum (metric (mem.used mean) (mem.used mean)))",
      300, "zone in [\"east\"]", Seq("zone")))
    assert(dup == Seq(
      ("east", "2015-03-06 14:30:00.0", 40.0),
      ("east", "2015-03-06 14:35:00.0", 60.0)))
    // rolling over the deduped leaf = the single-ref answer
    val roll = rows(fleet().groupByAggregatesOps(
      "(aggregate max (rolling mean 2 " +
        "(metric (mem.used mean) (mem.used mean))))",
      300, "zone in [\"east\", \"west\"]", Seq("zone")))
    assert(roll == Seq(
      ("east", "2015-03-06 14:35:00.0", 35.0),
      ("west", "2015-03-06 14:35:00.0", 55.0)))
  }

  test("rolling mean per series inside the group aggregate") {
    val got = rows(fleet().groupByAggregatesOps(
      "(aggregate max (rolling mean 2 (metric mem.used mean)))",
      300, "zone in [\"east\", \"west\"]", Seq("zone")))
    // full windows only → B2: east max(mean(10,20), mean(30,40)) = 35
    assert(got == Seq(
      ("east", "2015-03-06 14:35:00.0", 35.0),
      ("west", "2015-03-06 14:35:00.0", 55.0)))
  }

  test("deviation from the group mean (collapsed side broadcasts)") {
    val got = rows(fleet().groupByAggregatesOps(
      "(aggregate max (- (metric mem.used mean) " +
        "(aggregate mean (metric mem.used mean))))",
      300, "zone in [\"east\", \"west\"]", Seq("zone")))
    // east deviations B1: (10,30)-20 → max 10; B2: (20,40)-30 → max 10
    assert(got == Seq(
      ("east", "2015-03-06 14:30:00.0", 10.0),
      ("east", "2015-03-06 14:35:00.0", 10.0),
      ("west", "2015-03-06 14:30:00.0", 0.0),
      ("west", "2015-03-06 14:35:00.0", 0.0)))
  }

  test("uncollapsed metric leaves reject with clear errors") {
    val g = fleet()
    val e1 = intercept[IllegalArgumentException](g.groupByAggregatesOps(
      "(metric mem.used mean)", 300, "zone = \"east\"", Seq("zone")))
    assert(e1.getMessage.contains("collapsed"))
    val e2 = intercept[IllegalArgumentException](g.groupByAggregatesOps(
      "(aggregate sum (+ (metric mem.used mean) (metric mem.total mean)))",
      300, "zone = \"east\"", Seq("zone")))
    assert(e2.getMessage.contains("ambiguous"))
  }

  test("an all-absent bucket still emits through the sparse collapse: " +
      "nansum pads 0.0 on the cross-subtree bucket union " +
      "(operations.py:26-36 — exercised by the pad-at-root fast path, " +
      "no fill policy)") {
    val g = fleet()
    // west's only mem.used series (u3) loses its B2 point entirely;
    // mem.total still carries B2, so the union grid has a B2 row where
    // used is all-absent → nansum emits 0.0 → ratio 0/200 = 0 %
    g.deleteMetric("u3")
    g.createMetric("u3", "low")
    g.addMeasures("u3", Seq(("2015-03-06 14:33:20", 50.0)))
    g.process()
    val s = spark
    import s.implicits._
    g.setMetrics(Seq(
      ("u1", "r1", "mem.used"), ("u2", "r2", "mem.used"), ("u3", "r3", "mem.used"),
      ("t1", "r1", "mem.total"), ("t2", "r2", "mem.total"), ("t3", "r3", "mem.total"))
      .toDF("metric_id", "resource_id", "name"))
    val got = rows(g.groupByAggregatesOps(
      "(* 100 (/ (aggregate sum (metric mem.used mean)) " +
        "(aggregate sum (metric mem.total mean))))",
      300, "zone = \"west\"", Seq("zone")))
    assert(got == Seq(
      ("west", "2015-03-06 14:30:00.0", 25.0),
      ("west", "2015-03-06 14:35:00.0", 0.0)))
  }

  test("fill densifies a missing series point before the collapse") {
    val g = fleet()
    // drop u3's B2 point by deleting + re-adding only B1. deleteMetric
    // also forgets the resource attachment (no dangling catalog rows),
    // so the re-created metric re-registers its attachment explicitly.
    g.deleteMetric("u3")
    g.createMetric("u3", "low")
    g.addMeasures("u3", Seq(("2015-03-06 14:33:20", 50.0)))
    g.process()
    val s = spark
    import s.implicits._
    g.setMetrics(Seq(
      ("u1", "r1", "mem.used"), ("u2", "r2", "mem.used"), ("u3", "r3", "mem.used"),
      ("t1", "r1", "mem.total"), ("t2", "r2", "mem.total"), ("t3", "r3", "mem.total"))
      .toDF("metric_id", "resource_id", "name"))
    val got = rows(g.groupByAggregatesOps(
      "(* 100 (/ (aggregate sum (metric mem.used mean)) " +
        "(aggregate sum (metric mem.total mean))))",
      300, "zone = \"west\"", Seq("zone"), fill = Some("0")))
    // west B2: used filled to 0 → 0 %; B1 unchanged
    assert(got == Seq(
      ("west", "2015-03-06 14:30:00.0", 25.0),
      ("west", "2015-03-06 14:35:00.0", 0.0)))
    // full_ffill: the same gap forward-fills from B1 (u3: 50), so
    // west B2 = 100*50/200 = 25 — this path used to throw
    // NumberFormatException ("full_ffill" fell into the numeric case)
    val ff = rows(g.groupByAggregatesOps(
      "(* 100 (/ (aggregate sum (metric mem.used mean)) " +
        "(aggregate sum (metric mem.total mean))))",
      300, "zone = \"west\"", Seq("zone"), fill = Some("full_ffill")))
    assert(ff == Seq(
      ("west", "2015-03-06 14:30:00.0", 25.0),
      ("west", "2015-03-06 14:35:00.0", 25.0)))
  }
}
