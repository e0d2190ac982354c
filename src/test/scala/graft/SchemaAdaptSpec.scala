package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.ExplainMode

/** The testdata generator has shipped `events.ts` both as ns-longs
  * (parquet TIMESTAMP(NANOS) under nanosAsLong) and as timestamp[us]
  * (read as TIMESTAMP_NTZ) across gate rounds; round 4 lost its entire
  * events plane to the switch. These pins make the reader era-proof:
  * type adaptation, instant equality across eras, and the raw-slice
  * predicate still reaching the parquet scan in both.
  */
class SchemaAdaptSpec extends SparkSpec {

  private val instants = Seq(
    (1L, "2024-01-01 00:00:01.5",      10L, "click", 1.0),
    (2L, "2024-01-05 12:00:00.000001", 11L, "view",  2.0),
    (3L, "2024-01-20 23:59:59.999999", 12L, "click", 3.0))

  /** Write a tiny events table in one ts era. The long era stores raw
    * epoch-ns BIGINTs — exactly what nanosAsLong hands the reader for
    * TIMESTAMP(NANOS) data; the µs era stores TIMESTAMP_NTZ, which
    * parquet records as TIMESTAMP(MICROS, isAdjustedToUTC=false) — the
    * round-4+ driver schema.
    */
  private def writeEra(dir: String, longNs: Boolean): String = {
    val s = spark
    import s.implicits._
    val base = instants.toDF("event_id", "t", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .withColumn("tt", to_timestamp(col("t")))
    val ts =
      if (longNs) (unix_micros(col("tt")) * 1000L).as("ts")
      else col("tt").cast(TimestampNTZType).as("ts")
    base.select(col("event_id"), ts, col("user_id"), col("event_type"),
        col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val nsDir = writeEra("/tmp/graft-spec-era-ns", longNs = true)
  private lazy val usDir = writeEra("/tmp/graft-spec-era-us", longNs = false)

  test("events() adapts both ts eras to identical TimestampType instants") {
    val ns = Queries.events(spark, nsDir)
    val us = Queries.events(spark, usDir)
    assert(ns.schema("ts").dataType === TimestampType)
    assert(us.schema("ts").dataType === TimestampType)
    def micros(df: DataFrame): Seq[(Long, Long)] =
      df.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(micros(ns) === micros(us))
    // spot-pin one absolute instant (UTC): 2024-01-05T12:00:00.000001
    assert(micros(us).find(_._1 == 2L).get._2 === 1704456000000001L)
  }

  test("eventsSlice pushes type-matched literals to the scan in both eras") {
    val loS = java.time.Instant.parse("2024-01-05T00:00:00Z").getEpochSecond
    val hiS = java.time.Instant.parse("2024-01-06T00:00:00Z").getEpochSecond
    for (dir <- Seq(nsDir, usDir)) {
      val sliced = Queries.eventsSlice(spark, dir, loS, hiS)
      assert(sliced.select("event_id").collect().map(_.getLong(0)).toSeq
        === Seq(2L), s"wrong slice rows for $dir")
      val plan = sliced.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      val pushed = plan.linesIterator
        .filter(_.trim.startsWith("PushedFilters:")).mkString
      assert(pushed.contains("GreaterThanOrEqual(ts") &&
        pushed.contains("LessThan(ts"),
        s"ts bounds not pushed to the scan for $dir:\n$pushed")
    }
  }

  test("property: random µs instants normalize identically across eras") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val s = spark
    import s.implicits._
    val genMicros = Gen.chooseNum(0L, 4_102_444_800_000_000L) // ..2100
    val p = Prop.forAll(Gen.listOfN(20, genMicros)) { micros =>
      val rows = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      val asNs = rows.map { case (id, us) => (id, us * 1000L) }
        .toDF("event_id", "ts")
      val asTs = rows.map { case (id, us) =>
        (id, java.time.LocalDateTime.ofEpochSecond(us / 1_000_000L,
          ((us % 1_000_000L) * 1000L).toInt, java.time.ZoneOffset.UTC))
      }.toDF("event_id", "ts")
      def norm(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        Queries.adaptTs(df).select(col("event_id"), unix_micros(col("ts")))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      norm(asNs) == norm(asTs) &&
        norm(asTs).map(_._2) == rows.sortBy(_._1).map(_._2)
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("events() rejects an unreadable ts type loudly") {
    val s = spark
    import s.implicits._
    val bad = Seq(("x", "2024")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Queries.adaptTs(bad))
    assert(e.getMessage.contains("unsupported"))
  }
}
