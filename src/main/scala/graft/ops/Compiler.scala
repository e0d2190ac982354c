package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Granularity
import graft.timeseries.Bucketing

/** Aligned evaluation grid: `bucket` timestamp column + one double column
  * per series (reference builds a numpy matrix, processor.py:165-198; we
  * keep it a DataFrame so Catalyst optimizes the whole expression tree).
  *
  * `partCols` are optional grouping dimensions (e.g. a groupby attribute
  * in a fleet-wide query): every window/aggregate in the compiler
  * partitions by them, so a grid carrying thousands of groups evaluates
  * as parallel per-group tasks instead of collapsing into the single
  * sorted partition an unpartitioned window would force. An empty list
  * (a single bounded series set — the reference's only shape) keeps the
  * one-partition window, which is exactly the reference's semantics.
  */
final case class Grid(df: DataFrame, cols: Seq[String],
                      partCols: Seq[String] = Nil)

/** Compiles the cross-metric DSL AST to Spark plans over a [[Grid]].
  *
  * The reference interprets the AST with numpy ufuncs over the matrix
  * (operations.py:331-365); here every elementwise op becomes a Catalyst
  * expression (whole-stage codegen), rolling becomes a row window, and
  * aggregate-across-metrics becomes an unpivot + hash aggregate.
  */
object Compiler {

  /** P3 grid build: long-format series `(ref, bucket, value)` → pivoted
    * grid with the union of all timestamps (missing cells = null).
    * Single shuffle on bucket.
    */
  def align(long: DataFrame, refs: Seq[String], refCol: String = "ref",
            bucketCol: String = "bucket", valueCol: String = "value",
            partCols: Seq[String] = Nil): Grid = {
    val df = long
      .groupBy((partCols.map(col) :+ col(bucketCol).as("bucket")): _*)
      .pivot(refCol, refs)
      .agg(first(col(valueCol)))
    Grid(df, refs, partCols)
  }

  /** X10 grid sanity (operations.py:303-328): all bucket timestamps
    * must share one residue modulo the declared granularity (⇒ every
    * inter-bucket gap is a whole multiple of it — the reference checks
    * the first gap; an aligned grid satisfies the stronger form).
    * Plan-time scalar check, like the reference's.
    */
  def sanityCheck(grid: Grid, granNs: Long): Grid = {
    val granUs = math.max(granNs / 1000, 1)
    val distinctResidues = grid.df
      .select(pmod(unix_micros(col("bucket")), lit(granUs)).as("r"))
      .agg(count_distinct(col("r")).as("k")).collect()(0).getLong(0)
    if (distinctResidues > 1) throw new IllegalArgumentException(
      s"timestamps and granularity don't match: ${granNs}ns grid carries " +
        s"$distinctResidues distinct residues")
    grid
  }

  /** P5 overlap: fraction (0-100) of grid rows where every series is
    * present. The reference trims each EDGE independently — the tail to
    * the last fully-overlapping row when `to` is unset, the head to the
    * first when `from` is unset (processor.py:206-212: two separate
    * `if` guards, not one) — and only when at least one overlapping row
    * exists (both trims gate on `overlap.size`; with zero overlap the
    * grid passes through untrimmed and the percent check decides).
    */
  def overlapPercent(grid: Grid, trimHead: Boolean,
                     trimTail: Boolean): (Grid, Double) = {
    val allPresent = grid.cols.map(c => col(c).isNotNull && !isnan(col(c)))
      .reduce(_ && _)
    val trimmed = if (trimHead || trimTail) {
      val bounds = grid.df.filter(allPresent)
        .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
        .collect()(0)
      if (bounds.isNullAt(0)) grid // no overlapping row → no trim
      else {
        val lo = if (trimHead)
          Some(col("bucket") >= bounds.getTimestamp(0)) else None
        val hi = if (trimTail)
          Some(col("bucket") <= bounds.getTimestamp(1)) else None
        grid.copy(df = Seq(lo, hi).flatten.foldLeft(grid.df)(_ filter _))
      }
    } else grid
    val counts = trimmed.df
      .agg(count(lit(1)).as("n"), count(when(allPresent, 1)).as("k"))
      .collect()(0)
    val pct = if (counts.getLong(0) == 0) 0.0
      else counts.getLong(1) * 100.0 / counts.getLong(0)
    (trimmed, pct)
  }

  /** Cross-metric AGG_MAP (operations.py:26-49): nan-skipping,
    * POPULATION std/var (numpy default ddof=0) — contrast the
    * archive-policy sample std.
    */
  private[ops] def acrossAgg(agg: String, v: Column): Column = agg match {
    case "mean"   => avg(v)
    case "sum"    => sum(v)
    case "min"    => min(v)
    case "max"    => max(v)
    case "count"  => count(v).cast("double")
    case "median" => median(v)
    case "std"    => stddev_pop(v)
    case "var"    => var_pop(v)
    case other    => throw new IllegalArgumentException(s"aggregate op $other")
  }

  /** AGG_MAP's nan-skipping form (operations.py:26-36: the numpy `nan*`
    * ufuncs): NaN cells are EXCLUDED from the aggregate — Spark skips
    * null but propagates NaN, so NaN maps to null first — and an
    * all-NaN/empty input follows numpy: `nansum` returns 0.0 and the
    * count 0, every other kernel returns NaN. Plain [[acrossAgg]] on
    * raw values matches carbonara's NON-skipping kernels instead
    * (resample, §A10); pick per the reference's call site.
    */
  private[graft] def nanSkipAgg(agg: String, v0: Column): Column = {
    val v = when(!isnan(v0), v0) // null for NaN and null alike
    agg match {
      case "sum"   => coalesce(sum(v), lit(0.0))
      case "count" => count(v).cast("double")
      case other   => coalesce(acrossAgg(other, v), lit(Double.NaN))
    }
  }

  /** [[nanSkipAgg]] as a window aggregate — `.over` must bind to the
    * aggregate itself, inside the null-handling wrapper.
    */
  private[graft] def nanSkipAggOver(agg: String, v0: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val v = when(!isnan(v0), v0)
    agg match {
      case "sum"   => coalesce(sum(v).over(w), lit(0.0))
      case "count" => count(v).over(w).cast("double")
      // Spark's median rejects window frames
      // (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC — fuzz-found, r12):
      // collect the frame's non-null values and interpolate exactly.
      // Rolling windows are small by construction (the reference
      // strides a bounded window over the series), so the per-row list
      // is a few elements.
      case "median" =>
        val arr = sort_array(collect_list(v).over(w)) // nulls excluded
        val n = size(arr)
        def at(i: Column) = element_at(arr, i.cast("int"))
        when(n === 0, lit(Double.NaN))
          .when(pmod(n, lit(2)) === 1, at((n + lit(1)) / lit(2)))
          .otherwise(
            (at(n / lit(2)) + at(n / lit(2) + lit(1))) / lit(2.0))
      case other   => coalesce(acrossAgg(other, v).over(w), lit(Double.NaN))
    }
  }

  // carbonara.py:578 percentile methods, valid in `resample` only
  // (RESAMPLE_AVAILABLE_AGG_MAP, operations.py:53-55)
  private val PctRe = "^([1-9][0-9]?)pct$".r

  /** Resample aggregation (operations.py:264-280 hands each series to
    * the CARBONARA kernels): the base AGG_MAP names minus `var`, plus
    * `last`/`first` (timestamp order) and exact-interpolated `Npct`
    * (RESAMPLE_AVAILABLE_AGG_MAP). NOT nan-skipping — carbonara's
    * bincount kernels poison a bucket through its NaN, and Spark's
    * NaN-greatest ordering reproduces the min/max/percentile edge
    * behavior (see KernelsSpec's NaN golden).
    */
  private[graft] def resampleAgg(agg: String, v: Column,
                               origBucket: Column): Column = agg match {
    case "var" => throw new IllegalArgumentException(
      "var is not available in resample (RESAMPLE_AVAILABLE_AGG_MAP)")
    case "std"    => stddev_samp(v) // carbonara sample std, not AGG_MAP's pop
    // first/last are over the series' PRESENT points — an absent grid
    // cell is not a point, so a null value must not win on bucket order
    // (fuzz-found, r12: max_by returned the null at the latest bucket).
    // Nulling the KEY drops the row from min_by/max_by consideration.
    case "last"   => max_by(v, when(v.isNotNull, origBucket))
    case "first"  => min_by(v, when(v.isNotNull, origBucket))
    case PctRe(n) => percentile(v, lit(n.toInt / 100.0))
    case other    => acrossAgg(other, v)
  }

  /** Comparison wrapper: null operands propagate null (absent grid
    * cells stay absent), NaN operands yield the numpy ufunc's fixed
    * verdict (`nanVal`), everything else takes the Spark comparison.
    */
  private def cmpNanGuard(l: Column, r: Column, res: Column,
                          nanVal: Double): Column =
    when(l.isNull || r.isNull, lit(null).cast("double"))
      .otherwise(when(isnan(l) || isnan(r), lit(nanVal)).otherwise(res))

  private[ops] def binCol(op: String, l: Column, r: Column): Column = op match {
    // numpy ufunc comparison semantics over NaN (operations.py binary
    // operators are numpy.equal & co.): EVERY comparison with a NaN
    // operand is False except != which is True — Spark instead treats
    // NaN = NaN as true and sorts NaN above every double. Null cells
    // keep propagating null (the grid's absent-cell rule).
    case "eq"  => cmpNanGuard(l, r, (l === r).cast("double"), nanVal = 0.0)
    case "ne"  => cmpNanGuard(l, r, (l =!= r).cast("double"), nanVal = 1.0)
    case "lt"  => cmpNanGuard(l, r, (l < r).cast("double"), nanVal = 0.0)
    case "gt"  => cmpNanGuard(l, r, (l > r).cast("double"), nanVal = 0.0)
    case "le"  => cmpNanGuard(l, r, (l <= r).cast("double"), nanVal = 0.0)
    case "ge"  => cmpNanGuard(l, r, (l >= r).cast("double"), nanVal = 0.0)
    case "add" => l + r
    case "sub" => l - r
    case "mul" => l * r
    // numpy.true_divide (operations.py:95-97): x/0 = ±inf (sign of x),
    // 0/0 = NaN. Under ANSI (Spark 4 default) a bare `/` instead THROWS
    // on the first zero divisor — one zero sample in the divisor metric
    // must not kill the whole query. (-0.0 divisors land on +inf where
    // numpy gives -inf; measures carrying negative zero are beyond the
    // tested surface.) CaseWhen branches evaluate lazily, so the
    // guarded `/` never sees a zero.
    case "div" =>
      when(r.isNull || l.isNull, lit(null).cast("double")) // missing cell
        .when(r =!= 0, l / r)
        .when(l === 0 || isnan(l), lit(Double.NaN))
        .otherwise(signum(l) * lit(Double.PositiveInfinity))
    // numpy.mod (operations.py:84-85) is FLOOR mod — the result takes
    // the DIVISOR's sign; Spark's % is truncated mod (dividend's sign),
    // diverging for mixed-sign operands. mod-by-zero keeps numpy's NaN.
    // The null guard mirrors div's: an ABSENT cell must stay absent
    // even against a zero divisor (the bare when(r===0, NaN) fired for
    // null dividends and manufactured a NaN out of a gap).
    case "mod" =>
      when(l.isNull || r.isNull, lit(null).cast("double"))
        .when(r === 0, lit(Double.NaN))
        .otherwise(l - floor(l / r) * r)
    case "pow" => pow(l, r)
    // the reference's binary max is numpy.fmax (operations.py:105) —
    // NaN-IGNORING: fmax(2, nan) = 2. Spark's greatest orders NaN above
    // every double, so guard explicitly. min2 is our symmetric
    // extension (the reference exposes no binary min), fmin-shaped.
    case "max2" =>
      when(isnan(l), r).when(isnan(r), l).otherwise(greatest(l, r))
    case "min2" =>
      when(isnan(l), r).when(isnan(r), l).otherwise(least(l, r))
    // numpy.clip PROPAGATES NaN (clip(nan, lo, hi) = nan); Spark's
    // least/greatest order NaN above all doubles, which would clamp a
    // NaN cell to the bound instead
    // …and a missing cell stays missing: greatest/least SKIP nulls, so
    // without the guard clip(absent) would manufacture the bound out
    // of a gap (numpy: clip(nan)=nan → skipped by every nan-agg).
    // A NaN BOUND also poisons (numpy clip(2, nan, None) = nan —
    // fuzz-found, r12: least(l, NaN) kept l because NaN sorts greatest),
    // and an absent bound cell propagates absence like every binary op.
    case "clip_min" =>
      when(l.isNull || isnan(l), l)
        .when(r.isNull, lit(null).cast("double"))
        .when(isnan(r), r)
        .otherwise(greatest(l, r))
    case "clip_max" =>
      when(l.isNull || isnan(l), l)
        .when(r.isNull, lit(null).cast("double"))
        .when(isnan(r), r)
        .otherwise(least(l, r))
  }

  /** Ternary clip, NaN-propagating like numpy.clip (a NaN cell stays
    * NaN; least/greatest alone would clamp it to `hi`) — and
    * null-propagating (least/greatest skip nulls, so an unguarded
    * clip would turn a missing cell into a bound).
    */
  private[ops] def clipCol(c: Column, lo: Column, hi: Column): Column =
    when(c.isNull || isnan(c), c).otherwise(least(greatest(c, lo), hi))

  private[ops] def unCol(op: String, c: Column): Column = op match {
    case "abs" | "absolute" => abs(c)
    case "neg" | "negative" => negate(c)
    case "cos"   => cos(c)
    case "sin"   => sin(c)
    case "tan"   => tan(c)
    // Spark's floor/ceil(double) return LONG, and the cast turns a NaN
    // cell into 0 — numpy floor/ceil(nan) = nan (fuzz-found, r12).
    // ±Inf must pass through too: the LONG cast otherwise SATURATES it
    // to ±Long.Max — a bogus finite 9.22e18 that then survives the
    // keyword-fill output drop where numpy's inf is removed
    // (refs-door fuzz, seed 987654, r13)
    case "floor" => when(isnan(c) || abs(c) === lit(Double.PositiveInfinity),
      c).otherwise(floor(c).cast("double"))
    case "ceil"  => when(isnan(c) || abs(c) === lit(Double.PositiveInfinity),
      c).otherwise(ceil(c).cast("double"))
  }

  /** Key columns of a grid: grouping dims + the bucket timestamp. */
  private def keyCols(g: Grid): Seq[Column] =
    g.partCols.map(col) :+ col("bucket")

  /** Per-grid window: partitioned by the grouping dims so multi-group
    * grids never serialize into one sorted task. */
  private def seriesWindow(g: Grid) =
    Window.partitionBy(g.partCols.map(col): _*).orderBy(col("bucket"))

  /** Try to compile a PURELY ELEMENTWISE tree (metric leaves, scalars,
    * binary/unary/clip ops — nothing that changes the row set) into
    * named column expressions over one base-grid row. Succeeding means
    * series⊕series arithmetic becomes a single projection instead of a
    * zipGrids SELF-JOIN of the grid — which would re-evaluate the
    * entire upstream plan (scans, collapses) once per side. Pairing
    * rules mirror zipGrids: positional for equal widths, a single
    * column broadcasts across the other side.
    */
  private def elementwise(node: Node,
                          base: Grid): Option[Seq[(String, Column)]] = node match {
    case MetricLeaf(refs) =>
      val names = refs.map { case (m, a) => refName(m, a) }
      if (names.forall(base.cols.contains)) Some(names.map(n => n -> col(n)))
      else None
    case Num(v) => Some(Seq("scalar" -> lit(v)))
    case Bin(op, l, r) =>
      for (lc <- elementwise(l, base); rc <- elementwise(r, base);
           pairs <-
             (if (lc.size == rc.size) Some(lc.zip(rc).map {
                // keep the SERIES name when a scalar literal sits on
                // the left — "(+ 2 m)" must name its column like
                // "(+ m 2)" and the non-elementwise path do
                case (("scalar", a), (rn, b)) => rn -> binCol(op, a, b)
                case ((n, a), (_, b)) => n -> binCol(op, a, b) })
              else if (rc.size == 1) Some(lc.map { case (n, a) =>
                n -> binCol(op, a, rc.head._2) })
              else if (lc.size == 1) Some(rc.map { case (n, b) =>
                n -> binCol(op, lc.head._2, b) })
              else None))
        yield pairs
    case Clip(sub, Num(lo), Num(hi)) =>
      elementwise(sub, base).map(_.map { case (n, c) =>
        n -> clipCol(c, lit(lo), lit(hi)) })
    case Un(op, sub) =>
      elementwise(sub, base).map(_.map { case (n, c) => n -> unCol(op, c) })
    case _ => None
  }

  /** Structural version of the elementwise test (no grid needed). */
  private def ewShape(n: Node): Boolean = n match {
    case Num(_) | MetricLeaf(_)  => true
    case Bin(_, l, r)            => ewShape(l) && ewShape(r)
    case Clip(s, Num(_), Num(_)) => ewShape(s)
    case Un(_, s)                => ewShape(s)
    case _                       => false
  }

  /** True when the subtree is SCALAR-VALUED end to end — a number or
    * arithmetic over numbers. The reference evaluates such a subtree
    * to a plain Python number (operations.py:334-335 short-circuits
    * `isinstance(nodes, numbers.Number)` before any ndarray work), so
    * it can never flip the is_aggregated flag.
    */
  private def isScalarTree(n: Node): Boolean = n match {
    case Num(_)          => true
    case Bin(_, l, r)    => isScalarTree(l) && isScalarTree(r)
    case Un(_, s)        => isScalarTree(s)
    case Clip(s, lo, hi) =>
      isScalarTree(s) && isScalarTree(lo) && isScalarTree(hi)
    case _               => false
  }

  /** Whether the operations tree "aggregates" in the reference's sense
    * (operations.py): `handle_aggregate` always returns True
    * (operations.py:232-240), and a binary/ternary op whose operands
    * are BOTH series grids sets it True (operations.py:168-178,
    * 204-216); unary ops, rolling, resample and scalar⊕series binaries
    * only propagate the flag. Drives the `/v1/aggregates` output
    * SHAPE (processor.py:229-272): aggregated → one "aggregated"
    * list; not aggregated → fan out per metric reference. Clip bounds
    * are scalar-only here, so Clip never sets the flag itself (the
    * reference needs all three operands to be ndarrays to set it,
    * operations.py:204-216).
    */
  def isAggregated(n: Node): Boolean = n match {
    case AggAcross(_, _) => true
    case Bin(_, l, r) =>
      // a SCALAR-VALUED subtree ((+ 1 2), (abs -3)) is a plain number
      // to the reference, not a series — isInstanceOf[Num] alone would
      // wrongly flip the flag for it
      (!isScalarTree(l) && !isScalarTree(r)) ||
        isAggregated(l) || isAggregated(r)
    case Clip(s, _, _)      => isAggregated(s)
    case Un(_, s)           => isAggregated(s)
    case RateOfChange(_, s) => isAggregated(s)
    case Rolling(_, _, s)   => isAggregated(s)
    case Resample(_, _, s)  => isAggregated(s)
    case _                  => false
  }

  /** True when evaluating `n` will hit the zipGrids self-join — a
    * series⊕series Bin where a side changes the row set (rolling,
    * rateofchange, aggregate, resample below it). Callers should
    * persist the base grid first: the join re-evaluates the grid's
    * entire upstream plan once per side otherwise.
    */
  def hasGridJoin(n: Node): Boolean = n match {
    case Bin(_, l, r) if !l.isInstanceOf[Num] && !r.isInstanceOf[Num] =>
      !(ewShape(l) && ewShape(r)) || hasGridJoin(l) || hasGridJoin(r)
    case Bin(_, l, r)       => hasGridJoin(l) || hasGridJoin(r)
    case Clip(s, _, _)      => hasGridJoin(s)
    case Un(_, s)           => hasGridJoin(s)
    case RateOfChange(_, s) => hasGridJoin(s)
    case AggAcross(_, s)    => hasGridJoin(s)
    case Rolling(_, _, s)   => hasGridJoin(s)
    case Resample(_, _, s)  => hasGridJoin(s)
    case _                  => false
  }

  /** Evaluate an AST node against the base grid. */
  def eval(node: Node, base: Grid): Grid = elementwise(node, base) match {
    case Some(cols) =>
      Grid(base.df.select((keyCols(base) ++
          cols.map { case (n, c) => c.as(n) }): _*),
        cols.map(_._1), base.partCols)
    case None => evalRec(node, base)
  }

  private def evalRec(node: Node, base: Grid): Grid = node match {
    case MetricLeaf(refs) =>
      val names = refs.map { case (m, a) => refName(m, a) }
      names.foreach { n =>
        require(base.cols.contains(n), s"series $n not in grid ${base.cols}")
      }
      Grid(base.df.select((keyCols(base) ++ names.map(col)): _*), names,
        base.partCols)

    case Num(v) =>
      // bare scalar grid: broadcast column over base timestamps
      Grid(base.df.select((keyCols(base) :+ lit(v).as("scalar")): _*),
        Seq("scalar"), base.partCols)

    case Bin(op, l, r) => (l, r) match {
      case (Num(v), rn) =>
        val g = eval(rn, base)
        mapCols(g, c => binCol(op, lit(v), c))
      case (ln, Num(v)) =>
        val g = eval(ln, base)
        mapCols(g, c => binCol(op, c, lit(v)))
      case (ln, rn) =>
        val lg = eval(ln, base)
        val rg = eval(rn, base)
        zipGrids(lg, rg, (a, b) => binCol(op, a, b))
    }

    case Clip(sub, lo, hi) =>
      val g = eval(sub, base)
      val loC = lo match { case Num(v) => lit(v); case _ => sys.error("clip bounds must be scalars") }
      val hiC = hi match { case Num(v) => lit(v); case _ => sys.error("clip bounds must be scalars") }
      mapCols(g, c => clipCol(c, loC, hiC))

    case Un(op, sub) => mapCols(eval(sub, base), c => unCol(op, c))

    case RateOfChange(perSec, sub) =>
      val g = eval(sub, base)
      val w = seriesWindow(g)
      val dt = unix_micros(col("bucket")) - lag(unix_micros(col("bucket")), 1).over(w)
      val out = g.cols.foldLeft(g.df) { (d, c) =>
        val diff = col(c) - lag(col(c), 1).over(w)
        d.withColumn(c, if (perSec) diff / (dt.cast("double") / 1e6) else diff)
      }
      // numpy.diff drops the first timestamp row (operations.py:139-141)
      Grid(out.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") > 1).drop("__rn"), g.cols, g.partCols)

    case AggAcross(agg, sub) =>
      val g = eval(sub, base)
      val (isRate, a) =
        if (agg.startsWith("rate:")) (true, agg.stripPrefix("rate:")) else (false, agg)
      val src = if (isRate) eval(RateOfChange(perSecond = false, sub), base) else g
      // unpivot cols → (bucket, value); aggregation is the numpy nan*
      // family, so an all-NaN/empty bucket still emits (nansum → 0.0,
      // count → 0, the rest → NaN — operations.py:26-36)
      val stacked = src.df.select((keyCols(src) :+
        explode(array(src.cols.map(c => col(c).cast("double")): _*)).as("v")): _*)
      Grid(stacked.groupBy(keyCols(src): _*)
        .agg(nanSkipAgg(a, col("v")).as("aggregated")),
        Seq("aggregated"), src.partCols)

    case Rolling(agg, n, sub) =>
      val g = eval(sub, base)
      // scale guard (the maxGroups discipline): the rolling-median path
      // collects the frame's values per OUTPUT ROW, so an unbounded
      // window parameter is an unbounded per-row array — reject beyond
      // a configurable cap instead of building 100k-element arrays
      val maxWindow = g.df.sparkSession.conf
        .get("spark.graft.rolling.maxWindow", "10000").toInt
      graft.api.GraftError.valid(n <= maxWindow,
        s"rolling window $n exceeds the spark.graft.rolling.maxWindow " +
          s"cap ($maxWindow)")
      val (isRate, a) =
        if (agg.startsWith("rate:")) (true, agg.stripPrefix("rate:")) else (false, agg)
      val w = seriesWindow(g).rowsBetween(-(n - 1), 0)
      // AGG_MAP is nan-skipping in rolling windows too (operations.py:
      // 243-260 hands the strided windows to the same nan* ufuncs)
      val rolled = g.cols.foldLeft(g.df) { (d, c) =>
        d.withColumn(s"__r_$c", nanSkipAggOver(a, col(c), w))
      }
      // emit only full windows (operations.py:245-250)
      val full = rolled.withColumn("__rn", row_number().over(seriesWindow(g)))
        .filter(col("__rn") >= n)
        .select((keyCols(g) ++ g.cols.map(c => col(s"__r_$c").as(c))): _*)
      // rate:X = first-difference of the rolled series, one more row
      // consumed (operations.py:38-49 rated_agg + :258-259)
      val out = if (!isRate) full else {
        val fg = Grid(full, g.cols, g.partCols)
        val sw2 = seriesWindow(fg)
        val diffed = g.cols.foldLeft(full) { (d, c) =>
          d.withColumn(c, col(c) - lag(col(c), 1).over(sw2))
        }
        diffed.withColumn("__rn2", row_number().over(sw2))
          .filter(col("__rn2") > 1).drop("__rn2")
      }
      Grid(out, g.cols, g.partCols)

    case Resample(agg, gran, sub) =>
      val g = eval(sub, base)
      val (isRate, a) =
        if (agg.startsWith("rate:")) (true, agg.stripPrefix("rate:")) else (false, agg)
      // rate:X resamples the FIRST-DIFFERENCED series (carbonara
      // GroupedTimeSeries.derived before bucketing, carbonara.py:212-221)
      val src = if (isRate) eval(RateOfChange(perSecond = false, sub), base) else g
      val floored = src.df
        .withColumn("__orig", col("bucket"))
        .withColumn("bucket", Bucketing.bucket(col("bucket"), gran))
      val aggd = floored.groupBy(keyCols(src): _*)
        .agg(resampleAgg(a, col(src.cols.head), col("__orig"))
               .as(src.cols.head),
             (src.cols.tail.map(c =>
                resampleAgg(a, col(c), col("__orig")).as(c)) ++
              src.cols.map(c => count(col(c)).as(s"__n_$c"))): _*)
      // carbonara's std drops n<=1 buckets per series
      // (carbonara.py:173-182); a multi-series grid nulls the cell
      val out =
        if (a != "std") aggd.select((keyCols(src) ++ src.cols.map(col)): _*)
        else aggd.select((keyCols(src) ++ src.cols.map(c =>
          when(col(s"__n_$c") > 1, col(c)).as(c))): _*)
          .filter(src.cols.map(c => col(c).isNotNull).reduce(_ || _))
      Grid(out, src.cols, src.partCols)
  }

  def refName(metric: String, agg: String): String = s"$metric/$agg"

  private def mapCols(g: Grid, f: Column => Column): Grid =
    Grid(g.df.select((keyCols(g) ++ g.cols.map(c => f(col(c)).as(c))): _*),
      g.cols, g.partCols)

  /** series⊕series: timestamps must match (operations.py:170-179 errors on
    * mismatch — we inner-join on (partCols, bucket)); columns pair up
    * positionally, single-column grids broadcast across the other
    * side's columns.
    */
  private def zipGrids(l: Grid, r: Grid, f: (Column, Column) => Column): Grid = {
    require(l.partCols == r.partCols,
      s"grid partition mismatch: ${l.partCols} vs ${r.partCols}")
    val rRenamed = r.cols.foldLeft(r.df)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
    val joined = l.df.join(rRenamed, l.partCols :+ "bucket", "inner")
    val pairs: Seq[(String, String, String)] =
      if (l.cols.size == r.cols.size) l.cols.zip(r.cols).map { case (a, b) => (a, s"__r_$b", a) }
      else if (r.cols.size == 1) l.cols.map(a => (a, s"__r_${r.cols.head}", a))
      else if (l.cols.size == 1) r.cols.map(b => (l.cols.head, s"__r_$b", b))
      else sys.error(s"shape mismatch: ${l.cols} vs ${r.cols}")
    val outCols = pairs.map { case (a, b, n) => f(col(a), col(b)).as(n) }
    Grid(joined.select((keyCols(l) ++ outCols): _*), pairs.map(_._3),
      l.partCols)
  }
}
