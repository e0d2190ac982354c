package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Granularity

/** Per-bucket aggregation kernels (reference gnocchi/carbonara.py:108-221,
  * `GroupedTimeSeries`). Every archive-policy method maps to a codegen'd
  * built-in aggregate — no UDFs in the hot path.
  *
  * Semantics pinned by the reference's goldens:
  *   - `std` is SAMPLE std-dev (ddof=1) and buckets with count<=1 are
  *     dropped from the output entirely (carbonara.py:173-182) — see
  *     [[Kernels.postFilter]].
  *   - `Npct` is the EXACT linear-interpolation percentile
  *     (carbonara.py:197-210); Spark's `percentile` matches numpy's
  *     `linear` method. NOT approx_percentile.
  *   - `first`/`last` are by timestamp order within the bucket
  *     (carbonara.py:187-195) → `min_by`/`max_by` on the ts column.
  */
object Kernels {

  // carbonara.py:578 `([1-9][0-9]?)pct`: 1-99 only, no leading zero —
  // "0pct" and "09pct" are unknown methods, not percentile 0/9
  private val PctRe = "^([1-9][0-9]?)pct$".r

  /** Aggregate expression for a base (non-rate) method over a value
    * column, given the timestamp column for order-sensitive methods.
    */
  def aggColumn(method: String, value: Column, ts: Column): Column =
    method match {
      case "mean"   => avg(value)
      case "sum"    => sum(value)
      case "min"    => min(value)
      case "max"    => max(value)
      case "count"  => count(value).cast("double")
      case "std"    => stddev_samp(value)
      case "median" => median(value)
      case "first"  => min_by(value, ts)
      case "last"   => max_by(value, ts)
      case PctRe(n) => percentile(value, lit(n.toInt / 100.0))
      case other    => throw new IllegalArgumentException(s"unknown method $other")
    }

  /** Post-aggregation row filter a method requires. `std` drops n<=1
    * buckets (carbonara.py:178-181: output indexed by counts > 1).
    */
  def needsCountGt1(method: String): Boolean = method == "std"

  def isRate(method: String): Boolean = method.startsWith("rate:")
  def baseMethod(method: String): String =
    if (isRate(method)) method.stripPrefix("rate:") else method

  /** Apply the `rate:` first-difference to raw measures BEFORE bucketing
    * (carbonara.py:212-221 `derived()`): per-series diff of consecutive
    * values in timestamp order; the first point of each series is
    * consumed (no previous value → dropped).
    */
  def derived(df: DataFrame, seriesCols: Seq[String], tsCol: String,
              valueCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    df.withColumn(valueCol, col(valueCol) - lag(col(valueCol), 1).over(w))
      .filter(col(valueCol).isNotNull)
  }

  /** One-shot: bucket raw measures and compute one method's series.
    *
    * Emits `keyCols..., bucket, value`. Handles rate: prefix, the std
    * n>1 drop, and calendar-vs-fixed granularities. The groupBy is a
    * single hash aggregate with map-side partial aggregation; with
    * `percentile`/`median` Spark falls back to ObjectHashAggregate,
    * still a single shuffle on (keyCols, bucket).
    */
  def aggregate(
      df: DataFrame,
      method: String,
      granularity: Granularity,
      keyCols: Seq[String],
      tsCol: String = "timestamp",
      valueCol: String = "value",
      tieCols: Seq[String] = Nil): DataFrame = {
    require(!(isRate(method) && granularity.isInstanceOf[Granularity.Calendar]),
      "rate aggregation on calendar granularity is forbidden (carbonara.py:212-215)")
    val base = baseMethod(method)
    val input =
      if (isRate(method)) derived(df, keyCols, tsCol, valueCol, tieCols) else df
    val bucketed = input.withColumn("bucket", Bucketing.bucket(col(tsCol), granularity))
    val grouped = bucketed
      .groupBy((keyCols.map(col) :+ col("bucket")): _*)
      .agg(
        aggColumn(base, col(valueCol), col(tsCol)).as("value"),
        count(col(valueCol)).as("__n"))
    val filtered =
      if (needsCountGt1(base)) grouped.filter(col("__n") > 1) else grouped
    filtered.drop("__n")
  }

  /** Every method of an archive policy in (at most) 1 + #rate-method
    * shuffles: the non-rate methods share ONE hash aggregate over the
    * bucketed input (one agg column each) and unpivot to long format;
    * each `rate:` method keeps the single-method path because its
    * input is the per-series diff, not the raw values. Emits
    * `keyCols..., bucket, method, value` — the ingest job's per-batch
    * shuffle count stops scaling with the policy's method list (the
    * reference's default policies carry 6-18 series per metric).
    */
  def aggregateAll(
      df: DataFrame,
      methods: Seq[String],
      granularity: Granularity,
      keyCols: Seq[String],
      tsCol: String = "timestamp",
      valueCol: String = "value",
      tieCols: Seq[String] = Nil): DataFrame = {
    require(methods.nonEmpty, "aggregateAll needs at least one method")
    val (rate, plain) = methods.partition(isRate)
    val plainDf =
      if (plain.isEmpty) Nil
      else {
        val bucketed =
          df.withColumn("bucket", Bucketing.bucket(col(tsCol), granularity))
        val aggs = plain.zipWithIndex.map { case (m, i) =>
          aggColumn(m, col(valueCol), col(tsCol)).as(s"__v$i")
        } :+ count(col(valueCol)).as("__n")
        val grouped = bucketed
          .groupBy((keyCols.map(col) :+ col("bucket")): _*)
          .agg(aggs.head, aggs.tail: _*)
        val mvs = plain.zipWithIndex.map { case (m, i) =>
          struct(lit(m).as("method"), col(s"__v$i").as("value"))
        }
        val dropWhenSingleton = plain.filter(needsCountGt1)
        Seq(grouped
          .select((keyCols.map(col) :+ col("bucket") :+ col("__n") :+
            explode(array(mvs: _*)).as("__mv")): _*)
          .filter(col("__n") > 1 ||
            !col("__mv.method").isin(dropWhenSingleton: _*))
          .select((keyCols.map(col) :+ col("bucket") :+
            col("__mv.method").as("method") :+
            col("__mv.value").as("value")): _*))
      }
    val rateDfs = rate.map { m =>
      aggregate(df, m, granularity, keyCols, tsCol, valueCol, tieCols)
        .select((keyCols.map(col) :+ col("bucket") :+
          lit(m).as("method") :+ col("value")): _*)
    }
    (plainDf ++ rateDfs).reduce(_ unionByName _)
  }
}
