package graft

import org.apache.spark.sql.functions._
import graft.model.Granularity
import graft.timeseries.{Bucketing, Kernels, TimeSeriesOps}

/** Golden tests ported from the reference's test_carbonara.py —
  * they pin exact aggregation semantics.
  */
class KernelsSpec extends SparkSpec {

  private def agg(method: String, rows: (String, String, Double)*)(g: Long = 60) =
    Kernels.aggregate(measures(rows: _*), method, Granularity.seconds(g),
      Seq("metric_id"), "timestamp", "value")
      .orderBy("bucket")
      .collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2)))
      .toSeq

  // test_carbonara.py:111-141 — base series [12:00:00->3, 12:00:04->5, 12:00:09->6]
  val base = Seq(
    ("m", "2014-01-01 12:00:00", 3.0),
    ("m", "2014-01-01 12:00:04", 5.0),
    ("m", "2014-01-01 12:00:09", 6.0))

  test("mean per minute bucket") {
    assert(agg("mean", base: _*)() ==
      Seq(("2014-01-01 12:00:00.0", (3.0 + 5 + 6) / 3)))
  }

  test("sum, min, max, count") {
    assert(agg("sum", base: _*)() == Seq(("2014-01-01 12:00:00.0", 14.0)))
    assert(agg("min", base: _*)() == Seq(("2014-01-01 12:00:00.0", 3.0)))
    assert(agg("max", base: _*)() == Seq(("2014-01-01 12:00:00.0", 6.0)))
    assert(agg("count", base: _*)() == Seq(("2014-01-01 12:00:00.0", 3.0)))
  }

  test("median: mean-of-two-middles for even counts (carbonara.py:162-171)") {
    val four = base :+ (("m", "2014-01-01 12:00:10", 9.0))
    assert(agg("median", four: _*)() == Seq(("2014-01-01 12:00:00.0", 5.5)))
  }

  test("74pct: exact linear interpolation (test_carbonara.py:243-278)") {
    // numpy percentile linear: sorted [3,5,6], pos = (3-1)*0.74 = 1.48
    // → 5 + 0.48*(6-5) = 5.48
    val got = agg("74pct", base: _*)()
    assert(got.size == 1)
    assert(math.abs(got.head._2 - 5.48) < 1e-9, s"got $got")
  }

  test("std is SAMPLE std and n<=1 buckets are dropped (carbonara.py:173-182)") {
    val rows = base :+ (("m", "2014-01-01 12:01:30", 42.0)) // second bucket n=1
    val got = agg("std", rows: _*)()
    assert(got.size == 1, s"n=1 bucket must be dropped entirely: $got")
    // numpy ddof=1 of [3,5,6] = 1.5275252316519468
    assert(math.abs(got.head._2 - 1.5275252316519468) < 1e-12)
  }

  test("first/last by timestamp order (carbonara.py:187-195)") {
    assert(agg("first", base: _*)() == Seq(("2014-01-01 12:00:00.0", 3.0)))
    assert(agg("last", base: _*)() == Seq(("2014-01-01 12:00:00.0", 6.0)))
  }

  test("rate: first-difference before bucketing (carbonara.py:212-221)") {
    // diffs: 5-3=2, 6-5=1 → mean = 1.5; first point consumed
    assert(agg("rate:mean", base: _*)() == Seq(("2014-01-01 12:00:00.0", 1.5)))
  }

  test("rate: forbidden on calendar granularity") {
    intercept[IllegalArgumentException] {
      Kernels.aggregate(measures(base: _*), "rate:mean",
        Granularity.Calendar("M"), Seq("metric_id"), "timestamp", "value")
    }
  }

  test("0pct / 09pct are unknown methods, not percentile 0/9 (carbonara.py:578)") {
    // reference regex is ([1-9][0-9]?)pct — 1-99, no leading zero
    intercept[IllegalArgumentException] {
      Kernels.aggColumn("0pct", col("value"), col("timestamp"))
    }
    intercept[IllegalArgumentException] {
      Kernels.aggColumn("09pct", col("value"), col("timestamp"))
    }
    Kernels.aggColumn("99pct", col("value"), col("timestamp")) // still fine
  }

  test("NaN measures propagate exactly like numpy (carbonara.py:134-210)") {
    // numpy argsort/lexsort order NaN last and Spark's double ordering
    // does the same (NaN above every value), so each kernel's NaN
    // behavior matches the reference with no special-casing:
    //   min IGNORES NaN (py:148-153 — reversed overwrite, real values
    //   written last), max returns it (py:155-160 — NaN written last),
    //   sum/mean/std poison through bincount (py:134-146, 173-182),
    //   median/quantile see it as the sort tail (py:162-171, 197-210),
    //   count counts it (py:184-185). Goldens recomputed with numpy.
    val rows = Seq(
      ("m", "2014-01-01 12:00:00", 3.0),
      ("m", "2014-01-01 12:00:04", Double.NaN),
      ("m", "2014-01-01 12:00:09", 5.0))
    def one(method: String): Double = agg(method, rows: _*)().head._2
    assert(one("min") == 3.0)
    assert(one("max").isNaN)
    assert(one("sum").isNaN)
    assert(one("mean").isNaN)
    assert(one("std").isNaN)
    assert(one("count") == 3.0)
    assert(one("median") == 5.0) // sorted [3, 5, NaN], odd count → index 1
    assert(one("95pct").isNaN)   // interpolates into the NaN tail
    assert(one("first") == 3.0)
    assert(one("last") == 5.0)
  }

  test("merge: new batch wins, first occurrence wins within batch (test_carbonara.py:84-104)") {
    // batch with duplicate timestamps: first occurrence at dup ts wins
    val s = spark
    import s.implicits._
    val newB = Seq(
      ("m", ts("2014-01-01 13:00:10"), 3.0, 1L),
      ("m", ts("2014-01-01 13:00:11"), 9.0, 2L),
      ("m", ts("2014-01-01 13:00:11"), 8.0, 3L),
      ("m", ts("2014-01-01 13:00:11"), 7.0, 4L))
      .toDF("metric_id", "timestamp", "value", "seq")
    val old = Seq(
      ("m", ts("2014-01-01 13:00:10"), 1.0, 1L),
      ("m", ts("2014-01-01 13:00:12"), 4.0, 2L))
      .toDF("metric_id", "timestamp", "value", "seq")
    val got = TimeSeriesOps.merge(newB, old, Seq("metric_id"), "timestamp", col("seq"))
      .orderBy("timestamp").select("timestamp", "value").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toSeq
    assert(got == Seq(
      ("2014-01-01 13:00:10.0", 3.0),  // new wins over stored 1.0
      ("2014-01-01 13:00:11.0", 9.0),  // first occurrence of dup wins
      ("2014-01-01 13:00:12.0", 4.0))) // stored point kept
  }

  test("resample is mean-of-means, not weighted mean (carbonara.py:594-598)") {
    val rows = Seq(
      ("m", "2014-01-01 12:00:00", 1.0), ("m", "2014-01-01 12:00:01", 1.0),
      ("m", "2014-01-01 12:00:02", 1.0), ("m", "2014-01-01 12:01:00", 4.0))
    val fine = Kernels.aggregate(measures(rows: _*), "mean",
      Granularity.seconds(60), Seq("metric_id"), "timestamp", "value")
    val got = TimeSeriesOps.resample(fine, "mean", Granularity.seconds(3600),
      Seq("metric_id")).collect().map(_.getDouble(2)).toSeq
    assert(got == Seq((1.0 + 4.0) / 2)) // NOT (1+1+1+4)/4
  }

  test("truncate keeps points strictly newer than last - timespan") {
    val rows = Seq(
      ("m", "2014-01-01 12:00:00", 1.0),
      ("m", "2014-01-01 12:10:00", 2.0),
      ("m", "2014-01-01 13:00:00", 3.0))
    val agg = Kernels.aggregate(measures(rows: _*), "mean",
      Granularity.seconds(60), Seq("metric_id"), "timestamp", "value")
    val got = TimeSeriesOps.truncate(agg, 3600L * 1_000_000_000L, Seq("metric_id"))
      .orderBy("bucket").collect().map(_.getDouble(2)).toSeq
    assert(got == Seq(2.0, 3.0)) // 12:00 == 13:00 - 1h → strictly-before drop
  }

  test("fetch floors `from` to granularity (carbonara.py:809-822)") {
    val agg = Kernels.aggregate(measures(base: _*), "mean",
      Granularity.seconds(60), Seq("metric_id"), "timestamp", "value")
    val got = TimeSeriesOps.fetch(agg, Granularity.seconds(60),
      Some(ts("2014-01-01 12:00:30")), None).collect()
    assert(got.length == 1) // 12:00:30 floored to 12:00 → bucket included
  }

  test("fetch stop is EXCLUSIVE: the bucket starting at the stop drops " +
      "(carbonara.py:809-822 slices [from_:to] via searchsorted " +
      "side='left')") {
    val rows = Seq(
      ("m", "2014-01-01 12:00:10", 1.0), ("m", "2014-01-01 12:01:10", 2.0))
    val agg = Kernels.aggregate(measures(rows: _*), "mean",
      Granularity.seconds(60), Seq("metric_id"), "timestamp", "value")
    val got = TimeSeriesOps.fetch(agg, Granularity.seconds(60),
      None, Some(ts("2014-01-01 12:01:00"))).collect()
    assert(got.length == 1) // the 12:01 bucket == stop → excluded
    // an unaligned stop keeps the bucket it lands inside
    val got2 = TimeSeriesOps.fetch(agg, Granularity.seconds(60),
      None, Some(ts("2014-01-01 12:01:01"))).collect()
    assert(got2.length == 2)
  }

  test("resample of rate: first-differences the STORED values before " +
      "re-bucketing (carbonara.py:668-676 from_grouped_serie derived())") {
    val s = spark
    import s.implicits._
    // stored rate:mean values (already rate) at 60s buckets
    val stored = Seq(
      ("m", ts("2014-01-01 12:00:00"), 1.0),
      ("m", ts("2014-01-01 12:01:00"), 3.0),
      ("m", ts("2014-01-01 12:02:00"), 6.0),
      ("m", ts("2014-01-01 12:03:00"), 10.0))
      .toDF("metric_id", "bucket", "value")
    val got = TimeSeriesOps.resample(stored, "rate:mean",
        Granularity.seconds(120), Seq("metric_id"))
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2))).toSeq
    // derived diffs land at [12:01→2, 12:02→3, 12:03→4]; 120s means:
    // bucket 12:00 = mean(2) = 2.0, bucket 12:02 = mean(3,4) = 3.5 —
    // plain mean-of-stored would give (1+3)/2=2, (6+10)/2=8
    assert(got == Seq(
      ("2014-01-01 12:00:00.0", 2.0), ("2014-01-01 12:02:00.0", 3.5)))
    // calendar targets cannot derive (carbonara.py:212-215)
    val e = intercept[IllegalArgumentException](TimeSeriesOps.resample(
      stored, "rate:mean", Granularity.Calendar("M"), Seq("metric_id")))
    assert(e.getMessage.contains("calendar"))
  }

  test("calendar buckets: week anchored Sunday (calendar.py:40-44)") {
    // 2014-01-01 is a Wednesday → week bucket = Sunday 2013-12-29
    val df = measures(("m", "2014-01-01 12:00:00", 1.0))
      .select(Bucketing.calendarBucket(col("timestamp"), "W").as("b"))
    assert(df.collect()(0).getTimestamp(0).toString == "2013-12-29 00:00:00.0")
  }

  test("calendar buckets: half-year") {
    val df = measures(
      ("m", "2014-03-01 00:00:00", 1.0), ("m", "2014-09-01 00:00:00", 1.0))
      .select(Bucketing.calendarBucket(col("timestamp"), "H").as("b"))
      .orderBy("b")
    assert(df.collect().map(_.getTimestamp(0).toString).toSeq ==
      Seq("2014-01-01 00:00:00.0", "2014-07-01 00:00:00.0"))
  }

  test("aggregateAll == per-method aggregate for a full method mix") {
    val df = measures(
      ("m1", "2014-01-01 12:00:01", 2.0), ("m1", "2014-01-01 12:00:20", 6.0),
      ("m1", "2014-01-01 12:01:05", 4.0), // singleton bucket → std dropped
      ("m2", "2014-01-01 12:00:10", 1.0), ("m2", "2014-01-01 12:00:40", 3.0),
      ("m2", "2014-01-01 12:01:10", 9.0), ("m2", "2014-01-01 12:01:50", 5.0))
    val methods = Seq("mean", "sum", "min", "max", "count", "std",
      "median", "first", "last", "95pct", "rate:mean")
    val fused = Kernels.aggregateAll(df, methods, Granularity.seconds(60),
        Seq("metric_id"), "timestamp", "value")
      .collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).toString, r.getString(2)),
        r.getDouble(3))).toMap
    val separate = methods.flatMap { m =>
      Kernels.aggregate(df, m, Granularity.seconds(60),
          Seq("metric_id"), "timestamp", "value")
        .collect()
        .map(r => ((r.getString(0), r.getTimestamp(1).toString, m),
          r.getDouble(2)))
    }.toMap
    assert(fused == separate)
    // std singleton bucket really is absent, not null
    assert(!fused.contains(("m1", "2014-01-01 12:01:00.0", "std")))
  }

  test("asofJoin: latest right at-or-before left ts, per key") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 10L, 100L), ("a", 20L, 101L), ("a", 5L, 102L),
      ("b", 15L, 103L)).toDF("k", "t", "lid")
    val right = Seq(("a", 10L, 1.0), ("a", 15L, 2.0), ("c", 1L, 9.0))
      .toDF("k", "t", "v")
    val got = graft.timeseries.TimeSeriesOps
      .asofJoin(left, right, Seq("k"), "t", "t")
      .orderBy("lid")
      .select("lid", "asof_ts", "asof_v")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    assert(got == Seq(
      (100L, 10L, 1.0),  // equal ts is visible (inclusive)
      (101L, 15L, 2.0),  // latest of the two priors
      (102L, -1L, -1.0), // before any right row -> null payload
      (103L, -1L, -1.0)))// key with no right rows at all
  }

  test("merge fast path: multi-column + unique orders stays hash-aggregated " +
      "and keeps whole rows; orderUnique=false survives exact ties untorn") {
    val s = spark
    import s.implicits._
    // (a) unique (prio, seq) per group — the default contract: winners
    // are whole input rows and the plan is pure HashAggregate (the
    // struct formulation would plan SortAggregate: a struct-valued
    // declarative buffer is not hash-aggregable)
    val newB = Seq(("m", ts("2014-01-01 13:00:10"), 3.0, 30L, 1L),
      ("m", ts("2014-01-01 13:00:11"), 9.0, 90L, 2L))
      .toDF("metric_id", "timestamp", "value", "aux", "seq")
    val old = Seq(("m", ts("2014-01-01 13:00:10"), 1.0, 10L, 7L),
      ("m", ts("2014-01-01 13:00:12"), 4.0, 40L, 8L))
      .toDF("metric_id", "timestamp", "value", "aux", "seq")
    val fast = TimeSeriesOps.merge(newB, old, Seq("metric_id"), "timestamp",
      col("seq"), orderBound = 1L << 32)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), "unique-order path must hash-agg")
    assert(plan.contains("HashAggregate"))
    val got = fast.orderBy("timestamp")
      .select("value", "aux", "seq").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((3.0, 30L, 1L), (9.0, 90L, 2L), (4.0, 40L, 8L)))
    // (b) exact packed-key tie with orderUnique=false: the winner must
    // be ONE consistent input row, never columns stitched from both
    val tied = Seq(("m", ts("2014-01-01 13:00:10"), 1.0, 100L, 5L),
      ("m", ts("2014-01-01 13:00:10"), 2.0, 200L, 5L))
      .toDF("metric_id", "timestamp", "value", "aux", "seq")
    val r = TimeSeriesOps.merge(tied, tied.limit(0), Seq("metric_id"),
      "timestamp", col("seq"), orderBound = 1L << 32, orderUnique = false)
      .select("value", "aux").head
    assert(Set((1.0, 100L), (2.0, 200L)).contains(
      (r.getDouble(0), r.getLong(1))), "tie must yield an untorn whole row")
  }

  test("asofJoin: NULL payload in the latest right row is NOT backfilled") {
    val s = spark
    import s.implicits._
    val left = Seq(("a", 20L, 100L)).toDF("k", "t", "lid")
    // latest right row (t=15) genuinely carries NULL v; an older row
    // (t=10) has v=1.0 — the join must take the WHOLE t=15 row, not
    // stitch asof_ts=15 with the older v
    val right = Seq(("a", 10L, Some(1.0)), ("a", 15L, None))
      .toDF("k", "t", "v")
    val r = graft.timeseries.TimeSeriesOps
      .asofJoin(left, right, Seq("k"), "t", "t")
      .select("asof_ts", "asof_v").head
    assert(r.getLong(0) == 15L)
    assert(r.isNullAt(1), "NULL payload must survive, not backfill")
  }
}
