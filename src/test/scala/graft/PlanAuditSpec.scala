package graft

import graft.api.Graft
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}

/** Plan pins for the r12 per-group granularity path: the onlyGroups
  * restriction must be a BROADCAST semi-join (not a per-group
  * predicate chain), keeping the plan size constant in the group
  * count. */
class PlanAuditSpec extends SparkSpec {

  test("onlyGroups restriction plans as one broadcast left-semi join") {
    val s = spark
    import s.implicits._
    val g = new Graft(s,
      java.nio.file.Files.createTempDirectory("graft-plan").toString)
    g.createPolicy(ArchivePolicy("pa", 0,
      Seq(ArchivePolicyItem(Granularity.seconds(60), None, None)),
      Set("mean")))
    val n = 200
    (1 to n).foreach(i => g.createMetric(s"pm$i", "pa"))
    g.batchAddMeasures((1 to n).map(i =>
      (s"pm$i", java.sql.Timestamp.valueOf("2015-01-01 12:00:30"), i * 1.0))
      .toDF("metric_id", "timestamp", "value"))
    g.process()
    g.setResources((1 to n).map(i => (s"pr$i", s"z$i")).toDF("id", "zone"))
    g.setMetrics((1 to n).map(i => (s"pm$i", s"pr$i", "cpu"))
      .toDF("metric_id", "resource_id", "name"))
    val keys: Seq[Seq[Any]] = (1 to n).map(i => Seq(s"z$i": Any))
    val df = g.groupByAggregatesOps("(aggregate mean (metric cpu mean))",
      60L, "id like '%'", Seq("zone"), onlyGroups = Some(keys))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    // the key set rides ONE relation, not one OR term per group
    val orTerms = "\\|\\|".r.findAllIn(plan).size
    assert(orTerms < 10, s"predicate blow-up: $orTerms OR terms")
  }
}
