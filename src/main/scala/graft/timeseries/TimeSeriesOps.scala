package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Granularity

/** Series-level operators over long-format frames
  * `(keyCols..., bucket|timestamp, value)`.
  */
object TimeSeriesOps {

  /** M1 `combine_timeseries` (carbonara.py:92-105): concat + dedup by
    * timestamp, NEW data wins on conflict; within one batch the FIRST
    * occurrence at a duplicate timestamp wins (pinned by
    * tests/test_carbonara.py:84-104).
    *
    * `newDf` and `oldDf` must share schema `(keyCols..., tsCol, value)`.
    * `orderCol` breaks within-batch ties (e.g. a monotonically-increasing
    * ingest sequence); pass a literal if batches are pre-deduped.
    *
    * One shuffle on (keyCols, ts) either way. When `orderCol` is a
    * non-negative long below `orderBound`, pass the bound to take the
    * hash-aggregate path (map-side partial dedup, no sort).
    *
    * `orderUnique = true` (default) asserts the caller's contract that
    * `(batch, orderCol)` is distinct per `(keyCols, tsCol)` group — an
    * ingest sequence number, a unique event id, or pre-deduped batches
    * all satisfy it. Under that contract per-column `min_by(col, pk)`
    * aggregates cannot disagree on the winner (no two rows share a
    * packed key), and every buffer stays primitive, so the whole dedup
    * is ONE codegen'd HashAggregate with map-side partial aggregation.
    * Pass `orderUnique = false` when order keys may collide within a
    * batch: the winner then rides as ONE struct `min_by` so a tie still
    * yields a consistent whole row — but a struct-valued declarative
    * aggregate buffer is not hash-aggregable and plans as
    * SortAggregate (measured ~2× at 32× scale), so only give up the
    * contract when the data truly can't honor it.
    */
  def merge(newDf: DataFrame, oldDf: DataFrame, keyCols: Seq[String],
            tsCol: String, orderCol: Column,
            orderBound: Long = 0L, orderUnique: Boolean = true): DataFrame = {
    // internal tags must not silently overwrite caller data columns —
    // the same loud contract asofJoin enforces for its tags
    Seq("__prio", "__pk", "__rn").filter(newDf.columns.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"merge: input carries reserved internal column '$c' — rename it"))
    val tagged = newDf.withColumn("__prio", lit(0))
      .unionByName(oldDf.withColumn("__prio", lit(1)))
    val dataCols = newDf.columns
      .filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    if (orderBound > 0 && orderBound <= (1L << 61) && dataCols.nonEmpty) {
      // Fast path: winner key packed into ONE long — (prio, order)
      // lexicographic as __prio*bound + order (caller guarantees
      // 0 <= order < bound) — so the surviving row is a min_by over the
      // packed key, which HashAggregates with map-side partial
      // aggregation. Measured 2× over the row_number window at 32×
      // scale (no per-partition sort, partial agg shrinks the shuffle).
      val packed = tagged.withColumn("__pk",
        col("__prio") * lit(orderBound) + orderCol.cast("long"))
      val grouped = packed.groupBy((keyCols.map(col) :+ col(tsCol)): _*)
      val winners =
        if (dataCols.size == 1 || orderUnique)
          grouped.agg(
            min_by(col(dataCols.head), col("__pk")).as(dataCols.head),
            dataCols.tail.map(c => min_by(col(c), col("__pk")).as(c)): _*)
        else
          grouped
            .agg(min_by(struct(dataCols.map(col): _*), col("__pk"))
              .as("__row"))
            .select((keyCols.map(col) :+ col(tsCol)) ++
              dataCols.map(c => col("__row").getField(c).as(c)): _*)
      winners.select(newDf.columns.toSeq.map(col): _*)
    } else {
      // General path (unbounded/non-numeric order): row_number window;
      // Spark 4's WindowGroupLimit dedups rank-1 groups map-side
      // before the shuffle
      val w = Window.partitionBy((keyCols.map(col) :+ col(tsCol)): _*)
        .orderBy(col("__prio"), orderCol)
      tagged.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__prio", "__rn")
    }
  }

  /** As-of join: attach to each left row the LATEST right row with
    * `rightTs <= leftTs` on the same key (telemetry staple: join each
    * measure to the config/revision in force at its timestamp).
    *
    * Spark-first formulation — no join operator at all: tag and union
    * both sides, then one `last(payload, ignoreNulls)` running window
    * per payload column ordered by (ts, side) carries the most recent
    * right values forward onto left rows. ONE shuffle + sort on the
    * key — the same cost a sort-merge join would pay for its left side
    * alone, with no probe-side buffering and no range-condition
    * explosion. Right rows at equal timestamps are visible to left
    * rows at that timestamp (inclusive semantics, side-ordered).
    *
    * `right` must be unique per (keyCols, rightTs) — pre-aggregate
    * otherwise (which latest-equal row wins is undefined there, like
    * any as-of implementation).
    *
    * The right payload rides as ONE struct through a single
    * `last(ignoreNulls)` window, never as per-column windows: a
    * per-column formulation would backfill a genuinely-NULL payload
    * value in the latest right row from an OLDER right row, stitching
    * `asof_ts` and payload columns from different right rows. The
    * struct is non-null whenever a right row exists, so the whole
    * latest row carries forward atomically — NULL fields included.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               payloadPrefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val payloadCols = right.columns
      .filterNot(c => keyCols.contains(c) || c == rightTs).toSeq
    val leftCols = left.columns.toSeq
    val otherLeft = leftCols.filterNot(c => keyCols.contains(c) || c == leftTs)
    // a left column named like an emitted payload column (chained
    // asofJoins with the same prefix) or like an internal tag would
    // silently produce a DUPLICATE-named output column — ambiguous on
    // the next select. Fail loudly; the caller picks another prefix.
    val emitted = (s"${payloadPrefix}ts" +: payloadCols.map(payloadPrefix + _))
      .toSet ++ Set("__ts", "__side", "__asof")
    val clash = otherLeft.filter(emitted)
    require(clash.isEmpty,
      s"asofJoin: left columns ${clash.mkString(", ")} collide with the " +
        s"'$payloadPrefix' payload output (or internal tags) — pass a " +
        "different payloadPrefix")
    val asofType = StructType(
      StructField(s"${payloadPrefix}ts", right.schema(rightTs).dataType) +:
        payloadCols.map(c => StructField(s"$payloadPrefix$c",
          right.schema(c).dataType)))
    val rTagged = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(
          (col(rightTs).as(s"${payloadPrefix}ts") +:
            payloadCols.map(c => col(c).as(s"$payloadPrefix$c"))): _*)
          .cast(asofType).as("__asof")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        otherLeft.map(col) ++
        Seq(lit(null).cast(asofType).as("__asof")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = rTagged.unionByName(lTagged)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    attached.filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++
          otherLeft.map(col) ++
          Seq(col("__asof").getField(s"${payloadPrefix}ts")
            .as(s"${payloadPrefix}ts")) ++
          payloadCols.map(c => col("__asof").getField(s"$payloadPrefix$c")
            .as(s"$payloadPrefix$c")) ++
          Seq(col("__ts").as(leftTs)): _*)
  }

  /** Sessionization: split each key's event stream into sessions at
    * inactivity gaps > `gapS` seconds (interaction-log staple; the
    * batch formulation of a session window). Gaps-and-islands: a
    * session-start flag per row (`ts - lag(ts) > gap`), then a running
    * sum assigns session ordinals — one shuffle + sort per key, both
    * windows share the exchange. Rows at equal timestamps always land
    * in the same session (gap 0), so tie order never changes the
    * result.
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 gapS: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol))
    // exact µs arithmetic — a seconds-floored gap test would split
    // sessions differently when the true gap straddles the threshold
    val ts = unix_micros(col(tsCol))
    val flag = when(
      ts - lag(ts, 1).over(w) > gapS * 1_000_000L ||
        lag(ts, 1).over(w).isNull, 1L)
      .otherwise(0L)
    df.withColumn("session_id", sum(flag).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** A10 resample (carbonara.py:594-598): re-aggregate an
    * already-aggregated series to a coarser granularity with the SAME
    * method. Note gnocchi semantics: resampled mean = mean-of-means (each
    * fine bucket weighs equally), not a weighted mean.
    */
  def resample(agg: DataFrame, method: String, coarser: Granularity,
               keyCols: Seq[String], bucketCol: String = "bucket",
               valueCol: String = "value"): DataFrame = {
    val base = Kernels.baseMethod(method)
    // rate:X resamples the FIRST-DIFFERENCED stored values
    // (carbonara.py:668-676 from_grouped_serie runs derived() before
    // re-bucketing; numpy.diff consumes the first point) — plain
    // re-bucketing of already-rate values would double-integrate.
    // Calendar targets cannot derive (carbonara.py:212-215 TypeError).
    val src =
      if (!method.startsWith("rate:")) agg
      else {
        coarser match {
          case _: Granularity.Calendar => throw new IllegalArgumentException(
            "Cannot derive aggregates on calendar granularities")
          case _ => ()
        }
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(bucketCol))
        agg.withColumn("__rn", row_number().over(w))
          .withColumn(valueCol, col(valueCol) - lag(col(valueCol), 1).over(w))
          .filter(col("__rn") > 1).drop("__rn")
      }
    val re = src.withColumn("__b2", Bucketing.bucket(col(bucketCol), coarser))
    val grouped = re.groupBy((keyCols.map(col) :+ col("__b2").as(bucketCol)): _*)
      .agg(Kernels.aggColumn(base, col(valueCol), col(bucketCol)).as(valueCol),
           count(col(valueCol)).as("__n"))
    val filtered =
      if (Kernels.needsCountGt1(base)) grouped.filter(col("__n") > 1) else grouped
    filtered.drop("__n")
  }

  /** A11 truncate (carbonara.py:618-638): retention — keep points
    * strictly newer than `lastTs - timespan`, per series.
    */
  def truncate(df: DataFrame, timespanNs: Long, keyCols: Seq[String],
               tsCol: String = "bucket"): DataFrame = {
    // same µs-alignment contract as fetchRaw — a silently floored
    // sub-µs timespan would hide a caller passing ms/µs instead of ns
    require(timespanNs % 1000 == 0,
      s"timespan must be whole microseconds, got ${timespanNs}ns")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val lastTs = max(col(tsCol)).over(w)
    df.withColumn("__cut", lastTs - expr(s"INTERVAL ${timespanNs / 1000} MICROSECOND"))
      .filter(col(tsCol) > col("__cut"))
      .drop("__cut")
  }

  /** Raw-scan variant of A12 for reads that aggregate on the fly: the
    * bucket slice `[floor(from,g), floor(to,g)+g)` is rewritten as a
    * predicate on the RAW timestamp column, so it reaches the parquet
    * scan (`PushedFilters`) and prunes row groups — a filter on the
    * derived bucket expression cannot push down and would read the
    * whole corpus at scale. Equivalence: for g-aligned F,
    * floor(ts/g)*g >= F  <=>  ts >= F, and
    * floor(ts/g)*g <= floor(to,g)  <=>  ts < floor(to,g)+g.
    */
  def fetchRaw(raw: DataFrame, granularity: Granularity,
               from: Option[java.sql.Timestamp],
               to: Option[java.sql.Timestamp],
               tsCol: String = "timestamp"): DataFrame = {
    val gNs = granularity match {
      case Granularity.Fixed(ns) => ns
      case _ => throw new IllegalArgumentException(
        "fetchRaw needs a fixed granularity")
    }
    require(gNs % 1000 == 0,
      s"fetchRaw: sub-microsecond granularity (${gNs}ns) cannot align " +
        "to microsecond timestamps")
    // µs-exact floor (whole-second math truncated sub-second
    // granularities to 0 and pre-epoch bounds toward zero)
    val gUs = gNs / 1000
    def floorUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      val us = Math.addExact(
        Math.multiplyExact(i.getEpochSecond, 1_000_000L), i.getNano / 1000L)
      Math.floorDiv(us, gUs) * gUs
    }
    val lo = from.map(f => col(tsCol) >= timestamp_micros(lit(floorUs(f))))
    val hi = to.map(t => col(tsCol) < timestamp_micros(lit(floorUs(t) + gUs)))
    Seq(lo, hi).flatten.foldLeft(raw)((d, p) => d.filter(p))
  }

  /** A12 fetch (carbonara.py:809-822): slice `[floor(from, g), to)` —
    * `from` is floored to the granularity so a 17:02 query returns the
    * 17:00 bucket; `to` is EXCLUSIVE (the reference slices
    * `self[from_:to]` via searchsorted side='left', carbonara.py:
    * 255-260 — the bucket whose start equals the stop drops). Plain
    * predicates → parquet row-group pruning.
    */
  def fetch(agg: DataFrame, granularity: Granularity,
            from: Option[java.sql.Timestamp], to: Option[java.sql.Timestamp],
            bucketCol: String = "bucket"): DataFrame = {
    val lo = from.map(f => col(bucketCol) >= Bucketing.bucket(lit(f), granularity))
    val hi = to.map(t => col(bucketCol) < lit(t))
    Seq(lo, hi).flatten.foldLeft(agg)((d, p) => d.filter(p))
  }

  /** P4 fill policies (processor.py:173-196; utils.py:373-381) applied to
    * value columns of an aligned grid. `cols` are the per-series value
    * columns; ts ordering within the whole grid (no partition key — the
    * grid is one logical series set; callers partition by group key
    * upstream if needed).
    */
  def fill(grid: DataFrame, cols: Seq[String], policy: String,
           tsCol: String = "bucket", partitionCols: Seq[String] = Nil): DataFrame = {
    // NaN is the numpy reference's missing marker for the KEYWORD
    // policies — dropna and the directional fills treat a NaN cell as
    // a gap, same as NULL here. The NUMERIC policy is the exception:
    // it only pre-fills absent cells (see the `num` case).
    def denan(c: org.apache.spark.sql.Column) =
      when(isnan(c), lit(null)).otherwise(c)
    def wAsc = {
      val base = if (partitionCols.nonEmpty)
        Window.partitionBy(partitionCols.map(col): _*) else Window.partitionBy()
      base.orderBy(col(tsCol)).rowsBetween(Window.unboundedPreceding, 0)
    }
    def wDesc = {
      val base = if (partitionCols.nonEmpty)
        Window.partitionBy(partitionCols.map(col): _*) else Window.partitionBy()
      base.orderBy(col(tsCol)).rowsBetween(0, Window.unboundedFollowing)
    }
    policy match {
      case "null" => grid
      case "dropna" =>
        grid.filter(cols.map(c => col(c).isNotNull && !isnan(col(c))).reduce(_ && _))
      case "ffill" =>
        cols.foldLeft(grid)((d, c) =>
          d.withColumn(c, last(denan(col(c)), ignoreNulls = true).over(wAsc)))
      case "bfill" =>
        cols.foldLeft(grid)((d, c) =>
          d.withColumn(c, first(denan(col(c)), ignoreNulls = true).over(wDesc)))
      case "full_ffill" =>
        val f = fill(grid, cols, "ffill", tsCol, partitionCols)
        fill(f, cols, "bfill", tsCol, partitionCols)
      case "full_bfill" =>
        val b = fill(grid, cols, "bfill", tsCol, partitionCols)
        fill(b, cols, "ffill", tsCol, partitionCols)
      case num =>
        val v = parseFloatLiteral(num).getOrElse(
          throw new IllegalArgumentException(s"fill policy $num"))
        // numeric fill pre-fills only ABSENT cells: the reference
        // initializes the grid with the filler and then overwrites it
        // with the actual values — NaN included (processor.py:172-181),
        // so a stored NaN survives a numeric fill. ffill/bfill differ
        // only because numpy cannot tell a data NaN from the NaN
        // filler there; here denan applies to those policies alone.
        cols.foldLeft(grid)((d, c) =>
          d.withColumn(c, coalesce(col(c), lit(v))))
    }
  }

  /** Any python float(x)-coercible literal — the reference's numeric
    * fill surface (rest/api.py voluptuous.Coerce(float)): scientific
    * notation ("1e5"), "inf", "nan" included, not just plain decimals.
    * Python float() spellings that Java's parseDouble rejects map
    * explicitly. Shared by the grid fill above and the legacy
    * cross-metric door's FillSchema so the two can never diverge.
    */
  def parseFloatLiteral(s: String): Option[Double] = s.trim.toLowerCase match {
    case "inf" | "+inf" | "infinity" | "+infinity" =>
      Some(Double.PositiveInfinity)
    case "-inf" | "-infinity" => Some(Double.NegativeInfinity)
    case "nan" | "+nan" | "-nan" => Some(Double.NaN)
    case t => t.toDoubleOption
  }
}
