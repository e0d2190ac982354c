package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.timeseries.Bucketing

/** Long-format evaluation of the operations DSL for RESOURCE-GROUPED
  * queries (`POST /v1/aggregates` with `groupby`,
  * rest/aggregates/api.py:191-493 + operations.py:331-365).
  *
  * In a grouped query a `(metric <name> <method>)` leaf names a metric
  * that exists once per resource, so the leaf's width — the number of
  * series columns in the reference's numpy matrix — varies per group.
  * A pivoted [[Grid]] cannot carry per-group variable columns, so
  * everything below an `(aggregate ...)` collapse evaluates here in
  * LONG format: `(grpCols..., sid, bucket, value)`, one row per series
  * point. Per-series operators (rolling, resample, rateofchange,
  * scalar arithmetic) become windows/aggregations partitioned by
  * `(grpCols, sid)` — thousands of groups × series evaluate as parallel
  * tasks, never via a per-group driver loop. An `(aggregate ...)` node
  * collapses the metric axis with ONE shuffle on `(grpCols, bucket)`,
  * after which the result is a single synthetic series (`sid="__agg"`)
  * per group.
  *
  * The caller (api.Graft.groupByAggregatesOps) rewrites each maximal
  * `aggregate` subtree into a synthetic grid column and lets
  * [[Compiler]] run the remaining scalar tree per group via Grid
  * partCols — so the full nested grammar (`(* 100 (/ (aggregate sum
  * (metric used mean)) (aggregate sum (metric total mean))))`) is
  * supported end-to-end.
  */
object GroupedOps {

  /** Distinct `(name, method)` metric references in a tree. */
  def collectRefs(n: Node): Seq[(String, String)] = n match {
    case MetricLeaf(refs)       => refs.distinct
    case Bin(_, l, r)           => (collectRefs(l) ++ collectRefs(r)).distinct
    case Clip(s, _, _)          => collectRefs(s)
    case Un(_, s)               => collectRefs(s)
    case RateOfChange(_, s)     => collectRefs(s)
    case AggAcross(_, s)        => collectRefs(s)
    case Rolling(_, _, s)       => collectRefs(s)
    case Resample(_, _, s)      => collectRefs(s)
    case _                      => Nil
  }

  /** Full grouped evaluation: expand each referenced metric once via
    * `expand` (sparse long frame `(grpCols..., sid, bucket, value)`),
    * densify to the per-group bucket union only when a positional
    * operator or fill policy demands it, collapse every aggregate
    * subtree in long format, and run the remaining scalar tree per
    * group through the partCols-aware grid [[Compiler]].
    * Output: `(grpCols..., bucket, value)`.
    */
  def run(ast: Node, grpCols: Seq[String],
          expand: ((String, String)) => DataFrame,
          fill: Option[String]): DataFrame = {
    // validate the tree SHAPE before any expand()/persist() work: a
    // malformed request (uncollapsed leaf, metric-free tree) must not
    // first run catalog actions and leak never-released cache entries
    val acc = scala.collection.mutable.ArrayBuffer[(String, Node)]()
    val rewritten = rewrite(ast, acc)
    val refs = collectRefs(ast)
    if (refs.isEmpty) throw new IllegalArgumentException(
      "grouped operations must reference at least one metric")
    // dropna/null never touch the grid (processor.py:173-175, mirrored
    // by the ungrouped door) — densify only for a real fill policy, a
    // positional operator, or MULTIPLE aggregate subtrees (whose
    // shared bucket union carries numpy's empty-bucket semantics:
    // nansum over an all-absent bucket is 0.0, not a missing row)
    val leafDense = fill.exists(f => f != "dropna" && f != "null") ||
      needsDense(ast)
    // When density is needed ONLY for cross-subtree bucket agreement
    // and every subtree is pure-elementwise over its leaves, the leaf
    // densify (|group buckets| × |series| rows — quadratic-ish when
    // groups are few and series many) is equivalent to collapsing
    // SPARSE and padding the collapsed (grpCols, bucket) output to the
    // bucket union with numpy's empty-bucket emission: nan-skipping
    // aggregates ignore the padded null cells, elementwise ops map
    // null→null, so only the all-absent buckets differ — exactly the
    // rows the pad adds. |buckets| × |groups| instead of × |series|.
    val padAtRoot = !leafDense && acc.size > 1 &&
      acc.forall { case (_, sub) => pureAggSubtree(sub) }
    val dense = leafDense || (acc.size > 1 && !padAtRoot)
    val counts = leafRefCounts(ast)
    // a ref frame consumed by more than one plan branch (densify reads
    // it three ways; a ref shared across aggregate subtrees feeds each)
    // would be re-evaluated per consumer — persist those once
    val refFrames = refs.map { r =>
      val df = expand(r)
      r -> (if (dense || counts.getOrElse(r, 0) > 1)
              graft.llm.OpCaches.persist(df) // released by the caller
            else df)
    }.toMap
    lazy val buckets = refFrames.values
      .map(_.select((grpCols.map(col) :+ col("bucket")): _*))
      .reduce(_ unionByName _).distinct()
    val leafFn: MetricLeaf => DataFrame = ml => ml.refs.zipWithIndex.map {
        case (r, i) =>
          val df0 = refFrames(r)
          // a ref repeated in ONE leaf is a distinct series to the
          // reference (two identical matrix columns): disambiguate its
          // sid so positional windows don't interleave the copies,
          // while cross-series aggregates still count it per occurrence.
          // The synthetic "#i" suffix is INTERNAL ONLY: every output
          // path of run() projects sid away (grpCols, bucket, value),
          // matching the reference's unnamed positional matrix columns
          // — keep it that way if sid ever gets surfaced.
          val df =
            if (ml.refs.indexOf(r) == i) df0
            else df0.withColumn("sid", concat(col("sid"), lit(s"#$i")))
          if (dense) densify(df, grpCols, buckets, fill) else df
      }.reduce(_ unionByName _)
    rewritten match {
      case MetricLeaf(Seq((only, _))) =>
        // whole expression is one aggregate subtree — no grid needed
        evalLong(acc.find(_._1 == only).get._2, grpCols, leafFn)
          .select((grpCols.map(col) ++ Seq(col("bucket"), col("value"))): _*)
      case _ =>
        val synthNames = acc.map { case (n, _) => Compiler.refName(n, "grouped") }
        // padAtRoot: collapse SPARSE first, then take the bucket union
        // from the COLLAPSED outputs — elementwise ops preserve the
        // row set, so collapse emits exactly the leaf bucket set. The
        // big leaf frames are consumed once each and never persisted;
        // only the tiny (grpCols, bucket) collapses are.
        val collapsedSubs = acc.map { case (name, sub) =>
          val out = evalLong(sub, grpCols, leafFn)
          (name, sub,
            if (padAtRoot) graft.llm.OpCaches.persist(out) else out)
        }
        lazy val collapsedBuckets = collapsedSubs
          .map(_._3.select((grpCols.map(col) :+ col("bucket")): _*))
          .reduce(_ unionByName _).distinct()
        val long = collapsedSubs.map { case (name, sub, out0) =>
          val out = if (padAtRoot)
                      padToBuckets(out0, sub, grpCols, collapsedBuckets)
                    else out0
          out.select((grpCols.map(col) ++ Seq(
              lit(Compiler.refName(name, "grouped")).as("ref"),
              col("bucket"), col("value"))): _*)
        }.reduce(_ unionByName _)
        val grid0 = Compiler.align(long, synthNames.toSeq, partCols = grpCols)
        // a non-elementwise series⊕series in the scalar tree self-joins
        // the grid — share the pivoted grid instead of rebuilding it
        val grid =
          if (Compiler.hasGridJoin(rewritten))
            grid0.copy(df = graft.llm.OpCaches.persist(grid0.df))
          else grid0
        val out = Compiler.eval(rewritten, grid)
        out.df.select((grpCols.map(col) ++ Seq(col("bucket"),
          col(out.cols.head).as("value"))): _*)
    }
  }

  /** Leaf occurrences per `(name, method)` ref — NOT deduplicated. */
  private def leafRefCounts(n: Node): Map[(String, String), Int] = n match {
    case MetricLeaf(refs)   => refs.groupBy(identity).view.mapValues(_.size).toMap
    case Bin(_, l, r) =>
      val (a, b) = (leafRefCounts(l), leafRefCounts(r))
      (a.keySet ++ b.keySet).map(k =>
        k -> (a.getOrElse(k, 0) + b.getOrElse(k, 0))).toMap
    case Clip(s, _, _)      => leafRefCounts(s)
    case Un(_, s)           => leafRefCounts(s)
    case RateOfChange(_, s) => leafRefCounts(s)
    case AggAcross(_, s)    => leafRefCounts(s)
    case Rolling(_, _, s)   => leafRefCounts(s)
    case Resample(_, _, s)  => leafRefCounts(s)
    case _                  => Map.empty
  }

  /** True when `n` is single-series per group by construction (every
    * metric axis below it has been collapsed by an aggregate).
    * Series⊕series arithmetic is only well-defined between collapsed
    * sides: numpy pairs matrix columns positionally, which has no
    * stable meaning across a per-group variable metric set.
    */
  def collapsed(n: Node): Boolean = n match {
    case AggAcross(_, _)      => true
    case Num(_)               => true
    case MetricLeaf(_)        => false
    case Bin(_, l, r)         => collapsed(l) && collapsed(r)
    case Clip(s, _, _)        => collapsed(s)
    case Un(_, s)             => collapsed(s)
    case RateOfChange(_, s)   => collapsed(s)
    case Rolling(_, _, s)     => collapsed(s)
    case Resample(_, _, s)    => collapsed(s)
  }

  /** Evaluate `node` to a long frame `(grpCols..., sid, bucket, value)`.
    * `leaf` expands a metric leaf to its per-group series (densified to
    * the group's bucket union by the caller, mirroring grid alignment).
    */
  def evalLong(node: Node, grpCols: Seq[String],
               leaf: MetricLeaf => DataFrame): DataFrame = {
    val seriesKeys = grpCols :+ "sid"
    def sw = Window.partitionBy(seriesKeys.map(col): _*).orderBy(col("bucket"))
    def mapValue(df: DataFrame, f: Column => Column): DataFrame =
      df.withColumn("value", f(col("value")))
    def ev(n: Node): DataFrame = evalLong(n, grpCols, leaf)

    node match {
      case m: MetricLeaf => leaf(m)

      case Num(_) => throw new IllegalArgumentException(
        "bare scalar is not a series in a grouped operation")

      case Bin(op, Num(v), r) => mapValue(ev(r), c => Compiler.binCol(op, lit(v), c))
      case Bin(op, l, Num(v)) => mapValue(ev(l), c => Compiler.binCol(op, c, lit(v)))

      case Bin(op, l, r) =>
        val (lc, rc) = (collapsed(l), collapsed(r))
        if (!lc && !rc) throw new IllegalArgumentException(
          "series⊕series between uncollapsed metric sets is ambiguous in a " +
            "grouped query; collapse each side with (aggregate ...) first")
        // inner join on (grp, bucket) = zipGrids' timestamp-alignment
        // rule; a collapsed single series broadcasts across the other
        // side's series exactly like a 1-column grid.
        if (rc) {
          val rdf = ev(r).select((grpCols.map(col) :+ col("bucket") :+
            col("value").as("__rv")): _*)
          ev(l).join(rdf, grpCols :+ "bucket")
            .withColumn("value", Compiler.binCol(op, col("value"), col("__rv")))
            .drop("__rv")
        } else {
          val ldf = ev(l).select((grpCols.map(col) :+ col("bucket") :+
            col("value").as("__lv")): _*)
          ev(r).join(ldf, grpCols :+ "bucket")
            .withColumn("value", Compiler.binCol(op, col("__lv"), col("value")))
            .drop("__lv")
        }

      case Clip(sub, lo, hi) =>
        val loC = lo match { case Num(v) => lit(v)
          case _ => throw new IllegalArgumentException("clip bounds must be scalars") }
        val hiC = hi match { case Num(v) => lit(v)
          case _ => throw new IllegalArgumentException("clip bounds must be scalars") }
        mapValue(ev(sub), c => Compiler.clipCol(c, loC, hiC))

      case Un(op, sub) => mapValue(ev(sub), c => Compiler.unCol(op, c))

      case RateOfChange(perSec, sub) =>
        val df = ev(sub)
        val dt = unix_micros(col("bucket")) -
          lag(unix_micros(col("bucket")), 1).over(sw)
        val diff = col("value") - lag(col("value"), 1).over(sw)
        df.withColumn("value",
            if (perSec) diff / (dt.cast("double") / 1e6) else diff)
          .withColumn("__rn", row_number().over(sw))
          .filter(col("__rn") > 1).drop("__rn") // numpy.diff drops row 1

      case Rolling(agg, n, sub) =>
        val (isRate, a) =
          if (agg.startsWith("rate:")) (true, agg.stripPrefix("rate:"))
          else (false, agg)
        val df = ev(sub)
        val w = sw.rowsBetween(-(n - 1), 0)
        // AGG_MAP is nan-skipping in rolling windows (operations.py:
        // 243-260); rate:X first-differences the rolled series and
        // consumes one more row (operations.py:38-49, :258-259)
        val full = df
          .withColumn("__roll", Compiler.nanSkipAggOver(a, col("value"), w))
          .withColumn("__rn", row_number().over(sw))
          .filter(col("__rn") >= n) // full windows only (operations.py:245-250)
          .withColumn("value", col("__roll")).drop("__roll", "__rn")
        if (!isRate) full
        else full
          .withColumn("value", col("value") - lag(col("value"), 1).over(sw))
          .withColumn("__rn2", row_number().over(sw))
          .filter(col("__rn2") > 1).drop("__rn2")

      case Resample(agg, gran, sub) =>
        val (isRate, a) =
          if (agg.startsWith("rate:")) (true, agg.stripPrefix("rate:"))
          else (false, agg)
        // rate:X resamples the first-differenced series (carbonara
        // GroupedTimeSeries.derived before bucketing, py:212-221);
        // the carbonara kernels also carry last/first/Npct and the
        // sample-std n<=1 drop
        val src = if (isRate) ev(RateOfChange(perSecond = false, sub))
                  else ev(sub)
        val aggd = src
          .withColumn("__orig", col("bucket"))
          .withColumn("bucket", Bucketing.bucket(col("bucket"), gran))
          .groupBy((seriesKeys.map(col) :+ col("bucket")): _*)
          .agg(Compiler.resampleAgg(a, col("value"), col("__orig"))
            .as("value"), count(col("value")).as("__n"))
        (if (a == "std") aggd.filter(col("__n") > 1) else aggd).drop("__n")

      case AggAcross(agg, sub) =>
        val (isRate, a) =
          if (agg.startsWith("rate:")) (true, agg.stripPrefix("rate:"))
          else (false, agg)
        val src = if (isRate) ev(RateOfChange(perSecond = false, sub)) else ev(sub)
        // numpy nan* semantics: NaN/absent cells skip, and an
        // all-absent bucket still emits (nansum → 0.0, count → 0,
        // the rest → NaN — operations.py:26-36)
        src.groupBy((grpCols.map(col) :+ col("bucket")): _*)
          .agg(Compiler.nanSkipAgg(a, col("value")).as("value"))
          .withColumn("sid", lit("__agg"))
          .select((grpCols.map(col) ++ Seq(col("sid"), col("bucket"),
            col("value"))): _*)
    }
  }

  /** Rewrite every maximal `(aggregate ...)` subtree into a synthetic
    * metric leaf named `__g<i>` and collect the subtrees, leaving a
    * scalar tree the grid [[Compiler]] can evaluate per group. A metric
    * leaf OUTSIDE any aggregate is an error: its per-group width is
    * variable, so no grid column can represent it.
    */
  def rewrite(n: Node,
              acc: scala.collection.mutable.ArrayBuffer[(String, Node)]): Node =
    n match {
      case a @ AggAcross(_, _) =>
        val name = s"__g${acc.size}"
        acc += ((name, a))
        MetricLeaf(Seq((name, "grouped")))
      case MetricLeaf(_) => throw new IllegalArgumentException(
        "grouped operations require every metric reference to be collapsed " +
          "by an (aggregate ...) node")
      case Bin(op, l, r)    => Bin(op, rewrite(l, acc), rewrite(r, acc))
      case Clip(s, lo, hi)  => Clip(rewrite(s, acc), lo, hi)
      case Un(op, s)        => Un(op, rewrite(s, acc))
      case RateOfChange(p, s) => RateOfChange(p, rewrite(s, acc))
      case Rolling(a, w, s) => Rolling(a, w, rewrite(s, acc))
      case Resample(a, g, s) => Resample(a, g, rewrite(s, acc))
      case other: Num       => other
    }

  /** Densify a sparse series frame `(grpCols..., sid, bucket, value)` to
    * the per-group bucket union `buckets` `(grpCols..., bucket)` —
    * the long-format equivalent of grid alignment's null cells — and
    * apply a fill policy (processor.py fill / TimeSeriesOps.fill
    * semantics; `dropna`/`null` keep NaN-skipping sparse evaluation).
    */
  def densify(df: DataFrame, grpCols: Seq[String], buckets: DataFrame,
              fill: Option[String]): DataFrame = {
    val seriesKeys = grpCols :+ "sid"
    val series = df.select(seriesKeys.map(col): _*).distinct()
    // SHUFFLE_HASH on the series side: both sides of the align join
    // are grid-sized (collapsed (series, bucket) rows), but the
    // planner can't see past the aggregates and falls back to
    // sort-merge at scale — the hint keeps the align sort-free, same
    // as the dedup/span joins (32× plan: 4 SMJ → 0)
    val dense = buckets.join(series, grpCols) // co-partitioned on grpCols
      .join(df.hint("shuffle_hash"), seriesKeys :+ "bucket", "left")
    val sw = Window.partitionBy(seriesKeys.map(col): _*).orderBy(col("bucket"))
    fill match {
      case None | Some("dropna") | Some("null") => dense // null cells NaN-skip
      case Some("ffill") => dense.withColumn("value",
        last(col("value"), ignoreNulls = true).over(
          sw.rowsBetween(Window.unboundedPreceding, 0)))
      case Some("bfill") => dense.withColumn("value",
        first(col("value"), ignoreNulls = true).over(
          sw.rowsBetween(0, Window.unboundedFollowing)))
      case Some("full_ffill") => dense.withColumn("value",
        coalesce(
          last(col("value"), ignoreNulls = true).over(
            sw.rowsBetween(Window.unboundedPreceding, 0)),
          first(col("value"), ignoreNulls = true).over(
            sw.rowsBetween(0, Window.unboundedFollowing))))
      case Some("full_bfill") => dense.withColumn("value",
        coalesce(
          first(col("value"), ignoreNulls = true).over(
            sw.rowsBetween(0, Window.unboundedFollowing)),
          last(col("value"), ignoreNulls = true).over(
            sw.rowsBetween(Window.unboundedPreceding, 0))))
      case Some(num) => dense.withColumn("value",
        coalesce(col("value"), lit(num.toDouble)))
    }
  }

  /** True when `n` is an aggregate subtree whose body only maps leaf
    * cells elementwise (scalar arithmetic / clip / unary): collapsing
    * SPARSE then padding the collapsed output (see [[padToBuckets]])
    * is then exactly equivalent to leaf-level densify, because
    * nan-skipping collapse ignores padded null cells and elementwise
    * ops map null to null. Positional ops (rolling, rateofchange,
    * `rate:` aggregates), resample (changes the bucket set), nested
    * aggregates and series⊕series joins all OBSERVE leaf density and
    * disqualify the subtree.
    */
  private def pureAggSubtree(n: Node): Boolean = n match {
    case AggAcross(agg, s) => !agg.startsWith("rate:") && pureElementwise(s)
    case _                 => false
  }

  /** Ops whose [[Compiler.binCol]] maps a null operand to null/NaN
    * (both skipped identically by the nan-skipping collapse). max2 /
    * min2 are EXCLUDED: their NaN-guard `when(isnan(l), …)
    * .otherwise(greatest/least(l, r))` turns a null cell into the
    * other operand (Spark's greatest/least skip nulls — which for
    * fmax IS numpy's behavior over an absent=NaN cell), so leaf
    * density is observable through them. clip_min / clip_max / Clip
    * are null-propagating by construction (clipCol's null guard).
    */
  private val NullSafeBin = Set("eq", "ne", "lt", "gt", "le", "ge",
    "add", "sub", "mul", "div", "mod", "pow", "clip_min", "clip_max")

  private def pureElementwise(n: Node): Boolean = n match {
    case MetricLeaf(_)      => true
    case Bin(op, Num(_), r) => NullSafeBin(op) && pureElementwise(r)
    case Bin(op, l, Num(_)) => NullSafeBin(op) && pureElementwise(l)
    case Clip(s, _, _)      => pureElementwise(s)
    case Un(_, s)           => pureElementwise(s)
    case _                  => false
  }

  /** Pad a COLLAPSED aggregate-subtree output `(grpCols..., sid,
    * bucket, value)` to the per-group bucket union with numpy's
    * empty-bucket emission (operations.py:26-36: nansum → 0.0,
    * count → 0, the rest → NaN) — restricted to groups that have at
    * least one series of the subtree's metrics, matching what
    * leaf-level densify (buckets ⋈ series on grpCols) would emit.
    */
  private def padToBuckets(df: DataFrame, sub: Node, grpCols: Seq[String],
                           buckets: DataFrame): DataFrame = {
    val padVal: Column = sub match {
      case AggAcross(agg, _) if agg == "sum" || agg == "count" => lit(0.0)
      case _ => lit(Double.NaN)
    }
    val grps = df.select(grpCols.map(col): _*).distinct()
    buckets.join(grps, grpCols) // tiny: one row per group with series
      // grid-sized align join — sort-free via SHUFFLE_HASH (see densify)
      .join(df.hint("shuffle_hash"), grpCols :+ "bucket", "left")
      .withColumn("value", coalesce(col("value"), padVal))
      .withColumn("sid", coalesce(col("sid"), lit("__agg")))
  }

  /** True when the tree contains a POSITIONAL operator (rolling /
    * rateofchange) over uncollapsed leaf series: those windows count
    * grid rows, so the leaves must be densified to the group's bucket
    * union first. Pure `(aggregate agg (metric ...))` shapes skip the
    * densify join entirely — collapse filters nulls anyway.
    */
  def needsDense(n: Node): Boolean = n match {
    case Rolling(_, _, s)     => !collapsed(s) || needsDense(s)
    case RateOfChange(_, s)   => !collapsed(s) || needsDense(s)
    case Bin(_, l, r)         => needsDense(l) || needsDense(r)
    case Clip(s, _, _)        => needsDense(s)
    case Un(_, s)             => needsDense(s)
    case Resample(_, _, s)    => needsDense(s)
    case AggAcross(agg, s)    => // rate:* wraps sub in a rateofchange
      (agg.startsWith("rate:") && !collapsed(s)) || needsDense(s)
    case _                    => false
  }
}
