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

  test("endDateInactive + autoClean lifecycle") {
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
    assert(byId("r1") != null) // inactive since t=1000 -> ended
    assert(byId("r2") == null) // active recently
    assert(byId("r3") != null) // already ended, untouched
    // grace: drop resources ended before now - grace
    val cleaned = Maintenance.autoClean(ended, now, graceS = 100_000L)
    assert(cleaned.select("id").collect().map(_.getString(0)).toSet == Set("r2"))
  }
}
