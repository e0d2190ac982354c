package graft

import org.apache.spark.sql.functions._
import graft.model.Granularity
import graft.ops._
import graft.timeseries.TimeSeriesOps

/** Cross-metric DSL goldens ported from test_aggregates.py. */
class OpsSpec extends SparkSpec {

  private def mkGrid(rows: (String, String, Double)*): Grid = {
    val s = spark
    import s.implicits._
    val long = rows.map { case (ref, t, v) => (ref, ts(t), v) }
      .toDF("ref", "bucket", "value")
    Compiler.align(long, rows.map(_._1).distinct)
  }

  private def values(g: Grid): Seq[(String, Seq[Double])] =
    g.df.orderBy("bucket").collect().map { r =>
      (r.getTimestamp(0).toString,
        g.cols.indices.map(i => if (r.isNullAt(i + 1)) Double.NaN else r.getDouble(i + 1)))
    }.toSeq

  val twoSeries = Seq(
    ("m1/mean", "2014-01-01 12:00:00", 1.0),
    ("m1/mean", "2014-01-01 12:01:00", 2.0),
    ("m1/mean", "2014-01-01 12:02:00", 3.0),
    ("m2/mean", "2014-01-01 12:00:00", 4.0),
    ("m2/mean", "2014-01-01 12:01:00", 5.0),
    ("m2/mean", "2014-01-01 12:02:00", 6.0))

  test("comparisons follow numpy NaN semantics: every NaN comparison " +
      "is 0.0 except != which is 1.0 (operations.py binary ufuncs — " +
      "Spark's own NaN===NaN/NaN-sorts-last would flip these)") {
    val g = mkGrid(
      ("m/mean", "2014-01-01 12:00:00", Double.NaN),
      ("m/mean", "2014-01-01 12:01:00", 5.0))
    def head(ops: String): Double =
      Compiler.eval(Parser.parse(ops), g).df.orderBy("bucket")
        .collect()(0).getDouble(1)
    assert(head("(= (metric m mean) (metric m mean))") == 0.0) // nan = nan
    assert(head("(!= (metric m mean) (metric m mean))") == 1.0)
    assert(head("(> (metric m mean) 0)") == 0.0) // NaN not > anything
    assert(head("(<= (metric m mean) 0)") == 0.0)
    // the non-NaN bucket keeps plain comparison results
    assert(Compiler.eval(Parser.parse("(> (metric m mean) 0)"), g)
      .df.orderBy("bucket").collect()(1).getDouble(1) == 1.0)
  }

  test("isAggregated ignores scalar-valued subtrees: (* (+ 1 2) " +
      "(metric m mean)) is scalar x series, not series x series " +
      "(operations.py:334-335 short-circuits plain numbers)") {
    assert(!Compiler.isAggregated(Parser.parse(
      "(* (+ 1 2) (metric m mean))")))
    assert(Compiler.isAggregated(Parser.parse(
      "(* (metric m1 mean) (metric m2 mean))")))
  }

  test("scalar broadcast: (* 4 (metric m1 mean))") {
    val g = Compiler.eval(Parser.parse("(* 4 (metric m1 mean))"), mkGrid(twoSeries: _*))
    assert(values(g).map(_._2.head) == Seq(4.0, 8.0, 12.0))
    // a left-operand scalar keeps the SERIES name, same as "(* m 4)"
    assert(g.cols == Seq("m1/mean"))
  }

  test("series⊕series pairwise: (- (metric m2 mean) (metric m1 mean))") {
    val g = Compiler.eval(Parser.parse("(- (metric m2 mean) (metric m1 mean))"),
      mkGrid(twoSeries: _*))
    assert(values(g).map(_._2.head) == Seq(3.0, 3.0, 3.0))
  }

  test("comparison yields 1.0/0.0 (numpy semantics, operations.py:160-188)") {
    val g = Compiler.eval(Parser.parse("(> (metric m1 mean) 1.5)"), mkGrid(twoSeries: _*))
    assert(values(g).map(_._2.head) == Seq(0.0, 1.0, 1.0))
  }

  test("clip ternary (operations.py:108-110)") {
    val g = Compiler.eval(Parser.parse("(clip (metric m1 mean) 1.5 2.5)"),
      mkGrid(twoSeries: _*))
    assert(values(g).map(_._2.head) == Seq(1.5, 2.0, 2.5))
  }

  test("mod is numpy FLOOR mod (divisor's sign), max is NaN-ignoring " +
      "fmax, clip propagates NaN (operations.py:84,105 + numpy.clip)") {
    val negSeries = Seq(
      ("m1/mean", "2014-01-01 12:00:00",  7.0),
      ("m1/mean", "2014-01-01 12:01:00", -7.0),
      ("m1/mean", "2014-01-01 12:02:00", -1.0))
    // python/numpy: 7 % -3 = -2, -7 % -3 = -1, -1 % -3 = -1
    val m = Compiler.eval(Parser.parse("(% (metric m1 mean) -3)"),
      mkGrid(negSeries: _*))
    assert(values(m).map(_._2.head) == Seq(-2.0, -1.0, -1.0))
    // ... and 7 % 3 = 1, -7 % 3 = 2, -1 % 3 = 2 (positive divisor)
    val p = Compiler.eval(Parser.parse("(% (metric m1 mean) 3)"),
      mkGrid(negSeries: _*))
    assert(values(p).map(_._2.head) == Seq(1.0, 2.0, 2.0))
    // NaN via 0/0 upstream: fmax ignores it, clip propagates it
    val nanSeries = Seq(
      ("m1/mean", "2014-01-01 12:00:00", 0.0),
      ("m2/mean", "2014-01-01 12:00:00", 0.0))
    val fm = Compiler.eval(Parser.parse(
      "(max (/ (metric m1 mean) (metric m2 mean)) 5)"),
      mkGrid(nanSeries: _*))
    assert(values(fm).map(_._2.head) == Seq(5.0)) // fmax(nan, 5) = 5
    val cl = Compiler.eval(Parser.parse(
      "(clip (/ (metric m1 mean) (metric m2 mean)) 1 2)"),
      mkGrid(nanSeries: _*))
    assert(values(cl).forall(_._2.head.isNaN)) // clip(nan, 1, 2) = nan
  }

  test("rolling sum 2 emitted only from the window-th point (test_aggregates.py:1427-1470)") {
    val g = Compiler.eval(Parser.parse("(rolling sum 2 (metric m1 mean))"),
      mkGrid(twoSeries: _*))
    assert(values(g).map(_._2.head) == Seq(3.0, 5.0)) // first point dropped
  }

  test("rolling window longer than the series emits nothing " +
      "(reference errors, operations.py:245-250 — empty is the " +
      "distributed analogue: length is unknowable at plan time)") {
    val g = Compiler.eval(Parser.parse("(rolling sum 5 (metric m1 mean))"),
      mkGrid(twoSeries: _*))
    assert(g.df.count() == 0)
  }

  test("rolling window beyond spark.graft.rolling.maxWindow rejects " +
      "with a clear error (scale guard: the median path collects the " +
      "frame per output row)") {
    val e = intercept[graft.api.GraftError.BadInput] {
      Compiler.eval(Parser.parse("(rolling sum 100000 (metric m1 mean))"),
        mkGrid(twoSeries: _*))
    }
    assert(e.getMessage.contains("spark.graft.rolling.maxWindow"))
  }

  test("clip over a partially-overlapping series: missing cells stay " +
      "missing (greatest/least skip nulls — an unguarded clip would " +
      "manufacture the bound out of a gap)") {
    val g = Compiler.eval(Parser.parse("(clip (metric m3 mean) 1.0 2.0)"),
      mkGrid(twoSeries :+ (("m3/mean", "2014-01-01 12:01:00", 10.0)): _*))
    val vs = values(g).map(_._2.head)
    assert(vs(1) == 2.0 && vs.count(_.isNaN) == 2)
    val mn = Compiler.eval(Parser.parse("(min (metric m3 mean) 2.0)"),
      mkGrid(twoSeries :+ (("m3/mean", "2014-01-01 12:01:00", 10.0)): _*))
    // binary min/max stay fmin/fmax-shaped: the gap yields the scalar
    assert(values(mn).map(_._2.head) == Seq(2.0, 2.0, 2.0))
  }

  test("binary op over partially-overlapping series: missing cells stay null") {
    val g = Compiler.eval(Parser.parse("(+ (metric m1 mean) (metric m3 mean))"),
      mkGrid(twoSeries :+ (("m3/mean", "2014-01-01 12:01:00", 10.0)): _*))
    val vs = values(g).map(_._2.head)
    assert(vs(1) == 12.0 && vs.count(_.isNaN) == 2)
  }

  test("JSON operations form parses to the same AST as the string form " +
      "(rest/aggregates/api.py:74-126)") {
    val str = Parser.parse(
      "(* 4 (rolling sum 2 (metric (m1 mean) (m2 max))))")
    val json = Parser.parseJson(
      """["*", 4, ["rolling", "sum", 2, ["metric", ["m1", "mean"], ["m2", "max"]]]]""")
    assert(str == json)
    assert(Parser.parseJson("""["metric", "m1", "mean"]""") ==
      Parser.parse("(metric m1 mean)"))
    assert(Parser.parseJson("""["clip", ["metric", "m1", "mean"], 1.5, 2.5]""") ==
      Parser.parse("(clip (metric m1 mean) 1.5 2.5)"))
  }

  test("aggregate mean across metrics per timestamp (operations.py:232-240)") {
    val g = Compiler.eval(
      Parser.parse("(aggregate mean (metric (m1 mean) (m2 mean)))"),
      mkGrid(twoSeries: _*))
    assert(values(g).map(_._2.head) == Seq(2.5, 3.5, 4.5))
  }

  test("aggregate std is POPULATION std (numpy nanstd ddof=0) — contrast kernel std") {
    val g = Compiler.eval(
      Parser.parse("(aggregate std (metric (m1 mean) (m2 mean)))"),
      mkGrid(twoSeries: _*))
    assert(values(g).map(_._2.head) == Seq(1.5, 1.5, 1.5)) // pop std of {1,4}
  }

  test("rateofchange drops the first timestamp (operations.py:139-141)") {
    val g = Compiler.eval(Parser.parse("(rateofchange (metric m1 mean))"),
      mkGrid(twoSeries: _*))
    assert(values(g).map(_._2.head) == Seq(1.0, 1.0))
  }

  test("rateofchangesec divides by elapsed seconds (operations.py:128-136)") {
    val g = Compiler.eval(Parser.parse("(rateofchangesec (metric m1 mean))"),
      mkGrid(twoSeries: _*))
    assert(values(g).map(_._2.head) == Seq(1.0 / 60, 1.0 / 60))
  }

  test("nan-skipping: aggregate over partially-missing grid") {
    val sparse = twoSeries :+ (("m1/mean", "2014-01-01 12:03:00", 10.0))
    val g = Compiler.eval(
      Parser.parse("(aggregate sum (metric (m1 mean) (m2 mean)))"), mkGrid(sparse: _*))
    assert(values(g).map(_._2.head) == Seq(5.0, 7.0, 9.0, 10.0))
  }

  test("numpy empty-bucket semantics: nansum of an all-absent bucket " +
      "is 0.0 and count 0, the rest NaN (operations.py:26-36)") {
    // m1 has no 12:03 point but m2 does → the 12:03 grid row exists
    // with an all-null m1 subtree: nansum -> 0.0, nanmean -> NaN
    val sparse = twoSeries :+ (("m2/mean", "2014-01-01 12:03:00", 7.0))
    def agg(a: String) = values(Compiler.eval(
      Parser.parse(s"(aggregate $a (metric m1 mean))"),
      mkGrid(sparse: _*))).map(_._2.head)
    assert(agg("sum") == Seq(1.0, 2.0, 3.0, 0.0))
    assert(agg("count") == Seq(1.0, 1.0, 1.0, 0.0))
    val m = agg("mean")
    assert(m.take(3) == Seq(1.0, 2.0, 3.0) && m(3).isNaN)
  }

  test("rolling is nan-skipping (AGG_MAP nan* ufuncs) and rate: " +
      "first-differences the rolled series (operations.py:38-49)") {
    // a NaN cell (division blow-up) must be SKIPPED by rolling mean,
    // not poison both windows touching it
    val g0 = mkGrid(twoSeries: _*)
    val withNan = g0.copy(df = g0.df.withColumn("m1/mean",
      when(col("m1/mean") === 2.0, lit(Double.NaN))
        .otherwise(col("m1/mean"))))
    val rolled = values(Compiler.eval(
      Parser.parse("(rolling mean 2 (metric m1 mean))"), withNan))
      .map(_._2.head)
    assert(rolled == Seq(1.0, 3.0)) // nanmean skips the NaN middle
    // rate:sum over [1,2,3]: rolled-2 sums [3,5], diffed -> [2.0]
    val rated = values(Compiler.eval(
      Parser.parse("(rolling rate:sum 2 (metric m1 mean))"),
      mkGrid(twoSeries: _*))).map(_._2.head)
    assert(rated == Seq(2.0))
  }

  test("resample carries the carbonara-only aggregations: last/first " +
      "by timestamp, exact Npct, sample std with n<=1 drop, rate: " +
      "(operations.py:264-280, carbonara.py:173-210)") {
    def res(a: String) = values(Compiler.eval(
      Parser.parse(s"(resample $a 3600 (metric m1 mean))"),
      mkGrid(twoSeries: _*))).map(_._2.head)
    assert(res("last") == Seq(3.0))
    assert(res("first") == Seq(1.0))
    assert(res("50pct") == Seq(2.0))
    assert(res("std") == Seq(1.0)) // SAMPLE std of [1,2,3]
    // rate:mean = resample the first-differenced series: diffs [1,1]
    assert(res("rate:mean") == Seq(1.0))
    // var is not in RESAMPLE_AVAILABLE_AGG_MAP
    intercept[IllegalArgumentException] {
      Compiler.eval(Parser.parse("(resample var 3600 (metric m1 mean))"),
        mkGrid(twoSeries: _*)).df.collect()
    }
    // std drops n<=1 buckets: single-point series resamples to nothing
    val single = Seq(("m1/mean", "2014-01-01 12:00:00", 5.0))
    assert(values(Compiler.eval(
      Parser.parse("(resample std 3600 (metric m1 mean))"),
      mkGrid(single: _*))).isEmpty)
  }

  test("fill=ffill then overlap trim (processor.py:173-220)") {
    val sparse = Seq(
      ("a", "2014-01-01 12:00:00", 1.0),
      ("a", "2014-01-01 12:02:00", 3.0),
      ("b", "2014-01-01 12:00:00", 7.0),
      ("b", "2014-01-01 12:01:00", 8.0),
      ("b", "2014-01-01 12:02:00", 9.0))
    val g = mkGrid(sparse: _*)
    val filled = TimeSeriesOps.fill(g.df, Seq("a"), "ffill")
    val got = filled.orderBy("bucket").select("a").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 1.0, 3.0))
  }

  test("fill: NaN is a gap for the directional policies (numpy cannot " +
      "tell a data NaN from the NaN grid filler) but SURVIVES a " +
      "numeric fill (processor.py:172-181 pre-fills only absent " +
      "cells); the numeric guard rejects malformed policies typed-ly") {
    val s = spark
    import s.implicits._
    val grid = Seq(
      ("2014-01-01 12:00:00", Some(1.0)),
      ("2014-01-01 12:01:00", Some(Double.NaN)),
      ("2014-01-01 12:02:00", None),
      ("2014-01-01 12:03:00", Some(3.0)))
      .toDF("bucket", "a")
      .withColumn("bucket", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("bucket")))
    def vals(policy: String) =
      TimeSeriesOps.fill(grid, Seq("a"), policy)
        .orderBy("bucket").select("a").collect().map(_.getDouble(0)).toSeq
    assert(vals("ffill") == Seq(1.0, 1.0, 1.0, 3.0))
    assert(vals("bfill") == Seq(1.0, 3.0, 3.0, 3.0))
    // numeric fill: the absent cell takes 0, the data NaN stays NaN
    val filled0 = vals("0")
    assert(filled0(0) == 1.0 && filled0(1).isNaN &&
      filled0(2) == 0.0 && filled0(3) == 3.0)
    val e = intercept[IllegalArgumentException](vals("1.2.3"))
    assert(e.getMessage.contains("fill policy"))
  }

  test("fetchRaw: sub-second fixed granularity floors exactly " +
      "(whole-second math truncated 0.5s to 0 and crashed)") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      ("2014-01-01 12:00:01.4", 1.0),
      ("2014-01-01 12:00:01.6", 2.0),
      ("2014-01-01 12:00:02.1", 3.0))
      .toDF("timestamp", "value")
      .withColumn("timestamp", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("timestamp")))
    // from=1.6s at g=0.5s floors to 1.5s: the 1.4 point is excluded,
    // 1.6 (inside the floor bucket) and 2.1 survive
    val got = TimeSeriesOps.fetchRaw(raw,
        graft.model.Granularity.Fixed(500_000_000L),
        from = Some(java.sql.Timestamp.valueOf("2014-01-01 12:00:01.6")),
        to = None)
      .orderBy("timestamp").select("value").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(2.0, 3.0))
  }

  test("multi-group grid: windows partition per group, no single-partition exchange") {
    val s = spark
    import s.implicits._
    val long = Seq(
      ("g1", "m1/mean", "2014-01-01 12:00:00", 1.0),
      ("g1", "m1/mean", "2014-01-01 12:01:00", 2.0),
      ("g1", "m1/mean", "2014-01-01 12:02:00", 4.0),
      ("g2", "m1/mean", "2014-01-01 12:00:00", 10.0),
      ("g2", "m1/mean", "2014-01-01 12:01:00", 30.0),
      ("g2", "m1/mean", "2014-01-01 12:02:00", 70.0))
      .map { case (g, ref, t, v) => (g, ref, ts(t), v) }
      .toDF("grp", "ref", "bucket", "value")
    val grid = Compiler.align(long, Seq("m1/mean"), partCols = Seq("grp"))

    // rateofchange must diff WITHIN each group (and drop each group's
    // first row), not across the concatenated groups
    val roc = Compiler.eval(Parser.parse("(rateofchange (metric m1 mean))"), grid)
    val got = roc.df.orderBy("grp", "bucket").collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(got == Seq(("g1", 1.0), ("g1", 2.0), ("g2", 20.0), ("g2", 40.0)))
    assert(!roc.df.queryExecution.executedPlan.toString.contains("SinglePartition"))

    // rolling full-window rule applies per group
    val roll = Compiler.eval(Parser.parse("(rolling sum 3 (metric m1 mean))"), grid)
    val rollGot = roll.df.orderBy("grp").collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(rollGot == Seq(("g1", 7.0), ("g2", 110.0)))

    // fill=ffill partitioned by group: g2's leading null must NOT
    // inherit g1's last value
    val holey = Seq(
      ("g1", ts("2014-01-01 12:00:00"), Some(5.0)),
      ("g1", ts("2014-01-01 12:01:00"), None),
      ("g2", ts("2014-01-01 12:00:00"), None),
      ("g2", ts("2014-01-01 12:01:00"), Some(9.0)))
      .toDF("grp", "bucket", "v")
    val filled = TimeSeriesOps.fill(holey, Seq("v"), "ffill",
        partitionCols = Seq("grp"))
      .orderBy("grp", "bucket").collect()
      .map(r => (r.getString(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(filled.toSeq == Seq(
      ("g1", Some(5.0)), ("g1", Some(5.0)), ("g2", None), ("g2", Some(9.0))))
  }

  test("X10 grid sanity: off-granularity timestamps are rejected (operations.py:303-328)") {
    val aligned = mkGrid(
      ("m1/mean", "2014-01-01 12:00:00", 1.0),
      ("m1/mean", "2014-01-01 12:01:00", 2.0))
    Compiler.sanityCheck(aligned, 60L * 1_000_000_000L) // fine
    val skewed = mkGrid(
      ("m1/mean", "2014-01-01 12:00:00", 1.0),
      ("m1/mean", "2014-01-01 12:01:30", 2.0)) // 90 s gap on a 60 s grid
    intercept[IllegalArgumentException] {
      Compiler.sanityCheck(skewed, 60L * 1_000_000_000L)
    }
  }

  test("overlap percent + trim (processor.py:200-220)") {
    val sparse = Seq(
      ("a", "2014-01-01 12:01:00", 1.0),
      ("a", "2014-01-01 12:02:00", 3.0),
      ("b", "2014-01-01 12:00:00", 7.0),
      ("b", "2014-01-01 12:01:00", 8.0),
      ("b", "2014-01-01 12:02:00", 9.0),
      ("b", "2014-01-01 12:03:00", 9.5))
    val g = mkGrid(sparse: _*)
    val (trimmed, pct) = Compiler.overlapPercent(g,
      trimHead = true, trimTail = true)
    assert(pct == 100.0) // within trimmed [12:01, 12:02] all present
    assert(trimmed.df.count() == 2)
    val (_, pctNoTrim) = Compiler.overlapPercent(g,
      trimHead = false, trimTail = false)
    assert(pctNoTrim == 50.0)
    // per-EDGE trim (processor.py:206-212): bounded `to` keeps the
    // tail's non-overlapping row in the denominator, bounded `from`
    // keeps the head's
    val (headOnly, pctHead) = Compiler.overlapPercent(g,
      trimHead = true, trimTail = false)
    assert(pctHead * headOnly.df.count() == 200.0) // 2 of 3 rows overlap
    val (tailOnly, pctTail) = Compiler.overlapPercent(g,
      trimHead = false, trimTail = true)
    assert(pctTail * tailOnly.df.count() == 200.0)
  }
}
