package graft

import graft.ops._
import graft.model.Granularity
import org.apache.spark.sql.functions._

/** Property-based DIFFERENTIAL fuzzing of the operations DSL (X1-X9):
  * random well-typed trees evaluated by the Catalyst compiler against
  * an independent driver-side reference interpreter that implements the
  * documented numpy/carbonara semantics directly over vectors. The
  * hand-picked x-rows pin known semantics; this finds the unknown ones.
  *
  * The interpreter mirrors the PINNED divergences (absent grid cells
  * are null, not numpy-NaN operands; series⊕series joins inner on the
  * bucket set) and implements every cell kernel from first principles:
  * nan-skipping AGG_MAP across/rolling (nansum→0.0, count→0, rest→NaN
  * on empty), NON-skipping carbonara kernels in resample (NaN poisons,
  * min under Spark's NaN-greatest ordering, sample std with n≤1
  * dropped), numpy comparison verdicts under NaN, floor-mod, fmax/fmin,
  * NaN-propagating clip, diff dropping the first row.
  *
  * Seeded deterministically (override with GRAFT_FUZZ_SEED) so a CI
  * failure reproduces; ≥200 trees per run.
  */
class OpsFuzzSpec extends SparkSpec {

  // ---- fixture: 2 series, 8 buckets at 60 s, with gaps and NaNs ----
  private val bucketsS: Vector[Long] = Vector.tabulate(8)(_ * 60L)
  private val m1: Vector[Option[Double]] = Vector(
    Some(2.0), Some(-1.5), None, Some(Double.NaN), Some(4.0), Some(0.0),
    Some(7.25), None)
  private val m2: Vector[Option[Double]] = Vector(
    Some(1.0), None, Some(3.0), Some(2.0), Some(Double.NaN), Some(-2.0),
    None, Some(5.5))
  private val refNames = Vector("m1/mean", "m2/mean")

  // reference grid: rows (bucketS, cells by column)
  private case class RG(rows: Vector[(Long, Vector[Option[Double]])]) {
    def width: Int = rows.headOption.map(_._2.size).getOrElse(0)
  }
  private val baseRG = RG(bucketsS.zipWithIndex.map { case (b, i) =>
    b -> Vector(m1(i), m2(i))
  })

  private def isNaN(c: Option[Double]): Boolean = c.exists(_.isNaN)

  // ---- independent cell kernels --------------------------------------
  private def binCell(op: String, l: Option[Double],
                      r: Option[Double]): Option[Double] = op match {
    case "eq" | "ne" | "lt" | "gt" | "le" | "ge" =>
      if (l.isEmpty || r.isEmpty) None
      else if (isNaN(l) || isNaN(r)) Some(if (op == "ne") 1.0 else 0.0)
      else {
        val (a, b) = (l.get, r.get)
        val v = op match {
          case "eq" => a == b; case "ne" => a != b; case "lt" => a < b
          case "gt" => a > b; case "le" => a <= b; case "ge" => a >= b
        }
        Some(if (v) 1.0 else 0.0)
      }
    case "add" => for (a <- l; b <- r) yield a + b
    case "sub" => for (a <- l; b <- r) yield a - b
    case "mul" => for (a <- l; b <- r) yield a * b
    case "div" => for (a <- l; b <- r) yield
      if (b != 0) a / b
      else if (a == 0 || a.isNaN) Double.NaN
      else math.signum(a) * Double.PositiveInfinity
    case "mod" => for (a <- l; b <- r) yield
      if (b == 0) Double.NaN else a - math.floor(a / b) * b
    case "pow" => for (a <- l; b <- r) yield math.pow(a, b)
    // fmax/fmin ignore a NaN (and, per the absent≡skip rule the engine
    // inherits from null-skipping greatest/least, an absent) side
    case "max2" =>
      if (isNaN(l)) r else if (isNaN(r)) l
      else if (l.isEmpty) r else if (r.isEmpty) l
      else Some(math.max(l.get, r.get))
    case "min2" =>
      if (isNaN(l)) r else if (isNaN(r)) l
      else if (l.isEmpty) r else if (r.isEmpty) l
      else Some(math.min(l.get, r.get))
    case "clip_min" =>
      if (l.isEmpty || isNaN(l)) l else r.map(b => math.max(l.get, b))
    case "clip_max" =>
      if (l.isEmpty || isNaN(l)) l else r.map(b => math.min(l.get, b))
  }

  private def unCell(op: String, c: Option[Double]): Option[Double] =
    c.map { v =>
      op match {
        case "abs" | "absolute" => math.abs(v)
        case "neg" | "negative" => -v
        case "cos" => math.cos(v); case "sin" => math.sin(v)
        case "tan" => math.tan(v)
        case "floor" => math.floor(v); case "ceil" => math.ceil(v)
      }
    }

  /** nan-skipping AGG_MAP kernel (across + rolling): None/NaN excluded;
    * empty → nansum 0.0, count 0, everything else NaN. */
  private def nanSkip(agg: String, cells: Seq[Option[Double]]): Option[Double] = {
    val v = cells.collect { case Some(x) if !x.isNaN => x }
    agg match {
      case "sum"   => Some(v.sum)
      case "count" => Some(v.size.toDouble)
      case _ if v.isEmpty => Some(Double.NaN)
      case "mean"  => Some(v.sum / v.size)
      case "min"   => Some(v.min)
      case "max"   => Some(v.max)
      case "median" => Some(interp(v.sorted, 0.5))
      case "std"   => Some(popStd(v))
      case "var"   => Some(popStd(v) * popStd(v))
    }
  }

  private def popStd(v: Seq[Double]): Double = {
    val m = v.sum / v.size
    math.sqrt(v.map(x => (x - m) * (x - m)).sum / v.size)
  }

  /** Exact interpolated percentile over a SORTED sequence — the
    * ENGINE's lerp form (Spark Percentile.getPercentile:
    * `lower*(1-frac) + higher*frac`, exact index short-circuits).
    * ±Inf edges follow IEEE on THIS form — numpy's two-branch lerp
    * instead NaN-poisons whenever an infinity enters the pair (even
    * lerp(inf, inf, t)). Adjudicated divergence (see NOTES r13): an
    * Inf can only be produced by the DSL's already-pinned
    * div-by-zero total-function divergence, never by stored data, so
    * the engine keeps Spark's codegen'd percentile; the seed-777 door
    * fuzz found the two formulas disagreeing on an all-Inf bucket. */
  private def interp(sorted: Seq[Double], p: Double): Double = {
    val idx = p * (sorted.size - 1)
    val lo = math.floor(idx).toInt; val hi = math.ceil(idx).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (hi - idx) + sorted(hi) * (idx - lo)
  }

  /** Carbonara (NON-skipping) resample kernel: nulls skipped, NaN
    * poisons under Spark's NaN-greatest ordering (min still finds the
    * real minimum; max/mean/sum go NaN), sample std, first/last by
    * original bucket, exact-interpolated Npct with NaN sorted last. */
  private def resampleCell(agg: String,
      cells: Seq[(Long, Option[Double])]): Option[Double] = {
    val present = cells.collect { case (b, Some(x)) => (b, x) }
    val v = present.map(_._2)
    val reals = v.filterNot(_.isNaN)
    val pct = "^([1-9][0-9]?)pct$".r
    agg match {
      case "count" => Some(v.size.toDouble)
      case _ if v.isEmpty => None
      case "sum"  => Some(v.sum) // NaN poisons via the sum itself
      case "mean" => Some(v.sum / v.size)
      case "max"  => Some(if (reals.size < v.size) Double.NaN else v.max)
      case "min"  => Some(if (reals.isEmpty) Double.NaN else reals.min)
      case "first" => Some(present.minBy(_._1)._2)
      case "last"  => Some(present.maxBy(_._1)._2)
      case "std" =>
        if (v.size <= 1) None
        else if (reals.size < v.size) Some(Double.NaN)
        else {
          val m = v.sum / v.size
          Some(math.sqrt(v.map(x => (x - m) * (x - m)).sum / (v.size - 1)))
        }
      case pct(n) =>
        // NaN sorts above every real; interpolation touching one → NaN
        val sorted = reals.sorted ++ v.filter(_.isNaN)
        val idx = n.toInt / 100.0 * (sorted.size - 1)
        val (lo, hi) = (math.floor(idx).toInt, math.ceil(idx).toInt)
        if (sorted(lo).isNaN || sorted(hi).isNaN) Some(Double.NaN)
        else Some(interp(sorted, n.toInt / 100.0))
    }
  }

  // ---- the interpreter ------------------------------------------------
  private def rateOf(g: RG, perSec: Boolean): RG = RG(
    g.rows.zipWithIndex.drop(1).map { case ((b, cells), i) =>
      val (pb, prev) = g.rows(i - 1)
      val dt = (b - pb).toDouble
      b -> cells.zip(prev).map { case (c, p) =>
        for (x <- c; y <- p) yield if (perSec) (x - y) / dt else x - y
      }
    })

  private def mapCells(g: RG, f: Option[Double] => Option[Double]): RG =
    RG(g.rows.map { case (b, cells) => b -> cells.map(f) })

  private def zipRG(l: RG, r: RG,
                    f: (Option[Double], Option[Double]) => Option[Double]): RG = {
    val rm = r.rows.toMap
    RG(l.rows.flatMap { case (b, lc) =>
      rm.get(b).map { rc =>
        val pairs =
          if (lc.size == rc.size) lc.zip(rc)
          else if (rc.size == 1) lc.map(c => (c, rc.head))
          else if (lc.size == 1) rc.map(c => (lc.head, c))
          else sys.error("shape mismatch")
        b -> pairs.map { case (a, c) => f(a, c) }
      }
    })
  }

  private def ev(node: Node, base: RG,
                 names: Vector[String] = refNames): RG = node match {
    case MetricLeaf(refs) =>
      val idx = refs.map { case (m, a) => names.indexOf(s"$m/$a") }
      RG(base.rows.map { case (b, cells) => b -> idx.toVector.map(cells) })
    case Num(v) => RG(base.rows.map { case (b, _) => b -> Vector(Some(v)) })
    case Bin(op, Num(v), rn) =>
      mapCells(ev(rn, base, names), c => binCell(op, Some(v), c))
    case Bin(op, ln, Num(v)) =>
      mapCells(ev(ln, base, names), c => binCell(op, c, Some(v)))
    case Bin(op, ln, rn) =>
      zipRG(ev(ln, base, names), ev(rn, base, names),
        (a, b) => binCell(op, a, b))
    case Clip(sub, Num(lo), Num(hi)) =>
      mapCells(ev(sub, base, names), c =>
        if (c.isEmpty || isNaN(c)) c
        else Some(math.min(math.max(c.get, lo), hi)))
    case Clip(_, _, _) => sys.error("clip bounds must be scalars")
    case Un(op, sub) => mapCells(ev(sub, base, names), c => unCell(op, c))
    case RateOfChange(perSec, sub) => rateOf(ev(sub, base, names), perSec)
    case AggAcross(agg0, sub) =>
      val (isRate, agg) =
        if (agg0.startsWith("rate:")) (true, agg0.stripPrefix("rate:"))
        else (false, agg0)
      val g0 = ev(sub, base, names)
      val g = if (isRate) rateOf(g0, perSec = false) else g0
      RG(g.rows.map { case (b, cells) => b -> Vector(nanSkip(agg, cells)) })
    case Rolling(agg0, n, sub) =>
      val (isRate, agg) =
        if (agg0.startsWith("rate:")) (true, agg0.stripPrefix("rate:"))
        else (false, agg0)
      val g = ev(sub, base, names)
      val rolled = RG(g.rows.zipWithIndex.drop(n - 1).map { case ((b, _), i) =>
        val window = g.rows.slice(i - n + 1, i + 1).map(_._2)
        b -> Vector.tabulate(g.width)(c => nanSkip(agg, window.map(_(c))))
      })
      if (isRate) rateOf(rolled, perSec = false) else rolled
    case Resample(agg0, gran, sub) =>
      val (isRate, agg) =
        if (agg0.startsWith("rate:")) (true, agg0.stripPrefix("rate:"))
        else (false, agg0)
      val granS = gran match {
        case Granularity.Fixed(ns) => ns / 1_000_000_000L
        case _ => sys.error("calendar resample not fuzzed")
      }
      val g0 = ev(sub, base, names)
      val g = if (isRate) rateOf(g0, perSec = false) else g0
      val grouped = g.rows.groupBy { case (b, _) =>
        math.floorDiv(b, granS) * granS }.toVector.sortBy(_._1)
      val out = grouped.map { case (fb, rows) =>
        fb -> Vector.tabulate(g.width)(c =>
          resampleCell(agg, rows.map { case (b, cells) => (b, cells(c)) }))
      }
      // carbonara's std drops n<=1 buckets; a row where EVERY series
      // cell dropped disappears (Compiler.scala resample std filter)
      RG(if (agg == "std") out.filter(_._2.exists(_.isDefined)) else out)
  }

  // ---- random well-typed trees (width-tracked) ------------------------
  private val acrossAggs =
    Vector("mean", "sum", "min", "max", "count", "median", "std", "var")
  private val resampleAggs =
    Vector("mean", "sum", "min", "max", "count", "std", "first", "last",
      "50pct", "95pct")
  private val binOpsGen = Vector("add", "sub", "mul", "div", "mod", "pow",
    "eq", "ne", "lt", "gt", "le", "ge", "max", "min", "clip_min", "clip_max")
  private val unOpsGen =
    Vector("abs", "neg", "cos", "sin", "tan", "floor", "ceil")
  private val nums = Vector(-2.0, -1.0, -0.5, 0.0, 1.0, 2.5, 3.0, 10.0)

  /** Returns (tree, width); width 0 = scalar-valued subtree. */
  private def genTree(rnd: scala.util.Random, depth: Int): (Node, Int) = {
    def leaf(): (Node, Int) = rnd.nextInt(5) match {
      case 0 => (Num(nums(rnd.nextInt(nums.size))), 0)
      case 1 | 2 => (MetricLeaf(Seq(("m1", "mean"))), 1)
      case 3 => (MetricLeaf(Seq(("m2", "mean"))), 1)
      case 4 => (MetricLeaf(Seq(("m1", "mean"), ("m2", "mean"))), 2)
    }
    if (depth == 0) leaf()
    else rnd.nextInt(8) match {
      case 0 | 1 => // binary: widths equal, or either side ≤1
        val (l, lw) = genTree(rnd, depth - 1)
        val (r, rw) =
          if (lw <= 1) genTree(rnd, depth - 1)
          else if (rnd.nextBoolean()) genTree(rnd, 0) match {
            case t @ (_, w) if w <= 1 => t
            case _ => (Num(nums(rnd.nextInt(nums.size))), 0)
          }
          else (MetricLeaf(Seq(("m1", "mean"), ("m2", "mean"))), 2)
        val op = binOpsGen(rnd.nextInt(binOpsGen.size))
        if (lw == rw || lw <= 1 || rw <= 1)
          (Bin(Parser.binOps(op), l, r), math.max(lw, rw))
        else leaf()
      case 2 =>
        val (s, w) = genTree(rnd, depth - 1)
        (Un(unOpsGen(rnd.nextInt(unOpsGen.size)), s), w)
      case 3 =>
        val (s, w) = genTree(rnd, depth - 1)
        (Clip(s, Num(-1.0), Num(3.0)), w)
      case 4 =>
        val (s, w) = genTree(rnd, depth - 1)
        (RateOfChange(rnd.nextBoolean(), s), w)
      case 5 =>
        val (s, _) = genTree(rnd, depth - 1)
        val a0 = acrossAggs(rnd.nextInt(acrossAggs.size))
        val a = if (rnd.nextInt(6) == 0) "rate:" + a0 else a0
        (AggAcross(a, s), 1)
      case 6 =>
        val (s, w) = genTree(rnd, depth - 1)
        val a0 = acrossAggs(rnd.nextInt(acrossAggs.size))
        val a = if (rnd.nextInt(6) == 0) "rate:" + a0 else a0
        (Rolling(a, 1 + rnd.nextInt(4), s), w)
      case 7 =>
        val (s, w) = genTree(rnd, depth - 1)
        val a0 = resampleAggs(rnd.nextInt(resampleAggs.size))
        val a = if (rnd.nextInt(6) == 0) "rate:" + a0 else a0
        val gran = if (rnd.nextBoolean()) 120L else 300L
        (Resample(a, Granularity.seconds(gran), s), w)
    }
  }

  /** s-expression rendering (engine-canonical tokens) — also exercises
    * the Parser round-trip on every generated tree. */
  private def render(n: Node): String = n match {
    case Num(v) => if (v == v.floor && !v.isInfinite) v.toLong.toString
                   else v.toString
    case MetricLeaf(Seq((m, a))) => s"(metric $m $a)"
    case MetricLeaf(refs) =>
      "(metric " + refs.map { case (m, a) => s"($m $a)" }.mkString(" ") + ")"
    case Bin(op, l, r) =>
      val tok = op match { case "max2" => "max"; case "min2" => "min"
        case o => o }
      s"($tok ${render(l)} ${render(r)})"
    case Clip(s, lo, hi) => s"(clip ${render(s)} ${render(lo)} ${render(hi)})"
    case Un(op, s) => s"($op ${render(s)})"
    case RateOfChange(false, s) => s"(rateofchange ${render(s)})"
    case RateOfChange(true, s) => s"(rateofchangesec ${render(s)})"
    case AggAcross(a, s) => s"(aggregate $a ${render(s)})"
    case Rolling(a, w, s) => s"(rolling $a $w ${render(s)})"
    case Resample(a, g, s) => s"(resample $a ${g.token} ${render(s)})"
  }

  private def sameCell(a: Option[Double], b: Option[Double]): Boolean =
    (a, b) match {
      case (None, None) => true
      case (Some(x), Some(y)) =>
        (x.isNaN && y.isNaN) || x == y ||
          math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(x.abs, y.abs))
      case _ => false
    }

  test("differential fuzz: 220 random DSL trees — Catalyst compiler == " +
      "independent reference interpreter, cell for cell") {
    val s = spark
    import s.implicits._
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(120012L)
    val rnd = new scala.util.Random(seed)
    // engine base grid from the same fixture
    val long = bucketsS.zipWithIndex.flatMap { case (b, i) =>
      Seq(m1(i).map(v => ("m1/mean", new java.sql.Timestamp(b * 1000), v)),
          m2(i).map(v => ("m2/mean", new java.sql.Timestamp(b * 1000), v)))
        .flatten
    }.toDF("ref", "bucket", "value")
    val base = Compiler.align(long, refNames)
    val pinned = base.copy(df = base.df.localCheckpoint(true))
    var failures = List.empty[String]
    for (k <- 1 to 220) {
      val (tree, _) = genTree(rnd, 1 + rnd.nextInt(3))
      // parser round-trip on the rendered form
      val rendered = render(tree)
      assert(Parser.parse(rendered) === tree, s"parser round-trip: $rendered")
      val want = ev(tree, baseRG).rows
      val got =
        try Compiler.eval(tree, pinned).df.orderBy("bucket").collect()
          .toVector.map { r =>
            val b = r.getTimestamp(0).getTime / 1000
            b -> Vector.tabulate(r.size - 1)(i =>
              if (r.isNullAt(i + 1)) None
              else Some(r.getDouble(i + 1)))
          }
        catch { case e: Throwable =>
          failures ::= s"#$k ENGINE THREW: $rendered -> ${e.getMessage}"
          Vector.empty
        }
      if (failures.isEmpty || !failures.head.startsWith(s"#$k ")) {
        val ok = got.size == want.size && got.zip(want).forall {
          case ((gb, gc), (wb, wc)) =>
            gb == wb && gc.size == wc.size &&
              gc.zip(wc).forall { case (a, b) => sameCell(a, b) }
        }
        if (!ok) failures ::=
          s"#$k DIVERGED: $rendered\n  engine: $got\n  reference: $want"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} divergences (seed $seed):\n" +
        failures.reverse.take(5).mkString("\n"))
  }

  test("grouped-door fuzz: the long-format GroupedOps evaluator == the " +
      "grid Compiler on the same stored series (60 random aggregated " +
      "trees through the full facade)") {
    val s = spark
    import s.implicits._
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(120012L)
    val rnd = new scala.util.Random(seed + 1)
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-gfuzz").toString)
    g.createPolicy(graft.model.ArchivePolicy("gf", 0,
      Seq(graft.model.ArchivePolicyItem(
        graft.model.Granularity.seconds(60), None, None)),
      Set("mean")))
    g.createMetric("gm1", "gf"); g.createMetric("gm2", "gf")
    // the SAME gappy/NaN fixture as the compiler fuzz (raw==mean at one
    // point per bucket)
    def pts(cells: Vector[Option[Double]]): Seq[(String, Double)] =
      bucketsS.zipWithIndex.flatMap { case (b, i) =>
        cells(i).map(v =>
          (new java.sql.Timestamp(b * 1000).toString, v))
      }
    g.addMeasures("gm1", pts(m1))
    g.addMeasures("gm2", pts(m2))
    g.process()
    // ONE group holding both series under one metric NAME: the grouped
    // leaf (metric load mean) expands to exactly the multi-ref leaf
    // (metric (gm1 mean) (gm2 mean)) of the ungrouped door
    g.setResources(Seq(("gr1", "z")).toDF("id", "zone"))
    g.setMetrics(Seq(("gm1", "gr1", "load"), ("gm2", "gr1", "load"))
      .toDF("metric_id", "resource_id", "name"))
    val aggs = Vector("mean", "sum", "min", "max", "count", "std")
    def genEw(depth: Int): Node =
      if (depth == 0) MetricLeaf(Seq(("load", "mean")))
      else rnd.nextInt(3) match {
        case 0 => Bin(Parser.binOps(
          Vector("add", "mul", "div", "clip_min")(rnd.nextInt(4))),
          genEw(depth - 1), Num(nums(rnd.nextInt(nums.size))))
        case 1 => Un(unOpsGen(rnd.nextInt(unOpsGen.size)), genEw(depth - 1))
        case 2 => genEw(0)
      }
    def genAgg(): Node = AggAcross(aggs(rnd.nextInt(aggs.size)),
      genEw(rnd.nextInt(2)))
    def genTop(depth: Int): Node =
      if (depth == 0) genAgg()
      else rnd.nextInt(6) match {
        case 0 => Bin(Parser.binOps(
          Vector("add", "sub", "mul", "div")(rnd.nextInt(4))),
          genTop(depth - 1), genTop(0))
        case 1 => Un(unOpsGen(rnd.nextInt(unOpsGen.size)), genTop(depth - 1))
        case 2 => Rolling(aggs(rnd.nextInt(aggs.size)),
          1 + rnd.nextInt(3), genTop(depth - 1))
        case 3 => RateOfChange(rnd.nextBoolean(), genTop(depth - 1))
        case 4 => Resample("mean", graft.model.Granularity.seconds(120),
          genTop(depth - 1))
        case 5 => genAgg()
      }
    def twin(n: Node): Node = n match { // grouped leaf → explicit refs
      case MetricLeaf(Seq(("load", a))) =>
        MetricLeaf(Seq(("gm1", a), ("gm2", a)))
      case Bin(op, l, r) => Bin(op, twin(l), twin(r))
      case Clip(c, lo, hi) => Clip(twin(c), lo, hi)
      case Un(op, c) => Un(op, twin(c))
      case RateOfChange(p, c) => RateOfChange(p, twin(c))
      case AggAcross(a, c) => AggAcross(a, twin(c))
      case Rolling(a, w, c) => Rolling(a, w, twin(c))
      case Resample(a, gr, c) => Resample(a, gr, twin(c))
      case other => other
    }
    var failures = List.empty[String]
    for (k <- 1 to 60) {
      val tree = genTop(1 + rnd.nextInt(2))
      def rows(df: org.apache.spark.sql.DataFrame, valueCol: String)
          : Vector[(Long, Option[Double])] =
        df.orderBy("bucket").collect().toVector.map { r =>
          val vi = r.fieldIndex(valueCol)
          (r.getAs[java.sql.Timestamp]("bucket").getTime / 1000,
            if (r.isNullAt(vi)) None else Some(r.getDouble(vi)))
        }
      try {
        val grouped = rows(g.groupByAggregatesOps(render(tree), 60L,
          "zone = 'z'", Seq("zone")), "value")
        val flat0 = g.aggregates(render(twin(tree)), 60L)
        val flat = rows(flat0, flat0.columns.filterNot(_ == "bucket").head)
        val ok = grouped.size == flat.size && grouped.zip(flat).forall {
          case ((gb, gv), (fb, fv)) => gb == fb && sameCell(gv, fv)
        }
        if (!ok) failures ::= s"#$k DIVERGED: ${render(tree)}\n" +
          s"  grouped: $grouped\n  flat: $flat"
      } catch {
        case e: Throwable =>
          failures ::= s"#$k THREW: ${render(tree)} -> ${e.getMessage}"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} grouped divergences (seed $seed):\n" +
        failures.reverse.take(4).mkString("\n"))
  }

  test("door fuzz: 200 random fill × needed_overlap × from/to × " +
      "ragged-series grids through the full aggregates door == a " +
      "processor.py transcription (grid build, per-edge overlap trim, " +
      "fill, output drop)") {
    val s = spark
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(120012L)
    val rnd = new scala.util.Random(seed + 2)
    val g = new graft.api.Graft(s,
      java.nio.file.Files.createTempDirectory("graft-dfuzz").toString)
    g.createPolicy(graft.model.ArchivePolicy("pf", 0,
      Seq(graft.model.ArchivePolicyItem(
        graft.model.Granularity.seconds(60), None, None)),
      Set("mean")))
    // 4 stored ragged series over 12 buckets: absent 25% / NaN 15% /
    // value 60% (values on a 0.25 lattice so stored means are bit-exact)
    val nBuckets = 12
    val mNames = Vector("fm1", "fm2", "fm3", "fm4")
    val patterns: Vector[Vector[Option[Double]]] = mNames.map { _ =>
      val cells = Vector.tabulate(nBuckets) { _ =>
        rnd.nextInt(20) match {
          case x if x < 5 => None
          case x if x < 8 => Some(Double.NaN)
          case _          => Some((rnd.nextInt(41) - 20) * 0.25)
        }
      }
      if (cells.exists(c => c.exists(!_.isNaN))) cells
      else cells.updated(0, Some(1.0)) // the store needs ≥1 real point
    }
    for ((m, cells) <- mNames.zip(patterns)) {
      g.createMetric(m, "pf")
      g.addMeasures(m, cells.zipWithIndex.collect { case (Some(v), i) =>
        (new java.sql.Timestamp(i * 60L * 1000).toString, v) })
    }
    g.process()

    val keywordFills =
      Set("null", "dropna", "ffill", "bfill", "full_ffill", "full_bfill")

    /** processor.py transcription of the DOOR around the (already
      * differentially-fuzzed) evaluator: fetch slice → union grid with
      * the numeric-or-absent filler → directional fills (NaN ≡ gap,
      * numpy can't tell a data NaN from the NaN filler) → the per-EDGE
      * overlap trim + percent gate (only when fill is unset,
      * processor.py:200-220) → evaluate → output drop for dropna and
      * the directional fills (NaN/±inf/absent positions removed,
      * processor.py:237-244). Left = the door must throw.
      */
    def doorGrid(chosen: Vector[Int], fill: Option[String],
                 needed: Option[Double], fromS: Option[Long],
                 toS: Option[Long])
        : Either[String, Vector[(Long, Vector[Option[Double]])]] = {
      val numFill = fill.filterNot(keywordFills).map(_.toDouble)
      // fetch (A12): bucket >= from (60 s-aligned here), bucket < to
      val pts: Vector[Vector[(Long, Double)]] = chosen.map(i =>
        patterns(i).zipWithIndex.collect { case (Some(v), k)
            // A12 fetch: `from` FLOORS to the granularity, `to` is a
            // raw exclusive bound (TimeSeriesOps.fetch)
            if fromS.forall(f => k * 60L >= math.floorDiv(f, 60L) * 60L) &&
              toS.forall(k * 60L < _) =>
          (k * 60L, v)
        })
      val times = pts.flatten.map(_._1).distinct.sorted
      var grid: Vector[(Long, Vector[Option[Double]])] = times.map { t =>
        t -> chosen.indices.toVector.map { c =>
          pts(c).find(_._1 == t) match {
            case Some((_, v)) => Some(v) // data NaN SURVIVES numeric fill
            case None         => numFill
          }
        }
      }
      def gap(c: Option[Double]) = c.isEmpty || c.exists(_.isNaN)
      def dirFill(rows: Vector[(Long, Vector[Option[Double]])],
                  forward: Boolean) = {
        val ordered = if (forward) rows else rows.reverse
        val w = ordered.head._2.size
        val lastReal = Array.fill[Option[Double]](w)(None)
        val filled = ordered.map { case (b, cells) =>
          b -> Vector.tabulate(w) { c =>
            if (!gap(cells(c))) { lastReal(c) = cells(c); cells(c) }
            else lastReal(c)
          }
        }
        if (forward) filled else filled.reverse
      }
      fill match {
        case Some("ffill") if grid.nonEmpty => grid = dirFill(grid, true)
        case Some("bfill") if grid.nonEmpty => grid = dirFill(grid, false)
        case Some("full_ffill") if grid.nonEmpty =>
          grid = dirFill(dirFill(grid, true), false)
        case Some("full_bfill") if grid.nonEmpty =>
          grid = dirFill(dirFill(grid, false), true)
        case _ => ()
      }
      if (fill.isEmpty && needed.isDefined) {
        val need = needed.get
        val overlapIdx = grid.zipWithIndex.collect {
          case ((_, cells), i) if cells.forall(c => c.exists(!_.isNaN)) => i
        }
        if (overlapIdx.isEmpty && need > 0) return Left("No overlap")
        if (grid.nonEmpty) {
          if (toS.isEmpty && overlapIdx.nonEmpty)
            grid = grid.take(overlapIdx.last + 1)
          if (fromS.isEmpty && overlapIdx.nonEmpty)
            grid = grid.drop(overlapIdx.head)
          val pct = overlapIdx.size * 100.0 / grid.size
          if (pct < need) return Left(f"overlap $pct%.1f%% < $need%.1f%%")
        }
      }
      Right(grid)
    }

    def dropKeyword(fill: Option[String]): Boolean =
      fill.exists(f => f == "dropna" || f.endsWith("ffill") ||
        f.endsWith("bfill"))

    /** AGGREGATED arm: single output series, output-drop per the
      * processor's aggregated branch (processor.py:237-244). */
    def doorRef(tree: Node, chosen: Vector[Int], fill: Option[String],
                needed: Option[Double], fromS: Option[Long], toS: Option[Long])
        : Either[String, Vector[(Long, Option[Double])]] =
      doorGrid(chosen, fill, needed, fromS, toS).map { grid =>
        val names = chosen.map(i => s"${mNames(i)}/mean")
        val out = ev(tree, RG(grid), names).rows.map {
          case (b, cells) => (b, cells.head)
        }
        if (dropKeyword(fill))
          out.filter { case (_, c) => c.exists(v => !v.isNaN && !v.isInfinite) }
        else out
      }

    /** NON-aggregated (refs fan-out) arm: per-series long output —
      * absent cells never emit a row (the engine's pinned
      * absent≡no-point divergence from the reference's NaN-filled
      * m_output), keyword fills also drop NaN/±Inf per series
      * (processor.py:257-262). */
    def doorRefRefs(tree: Node, chosen: Vector[Int], fill: Option[String],
                    needed: Option[Double], fromS: Option[Long],
                    toS: Option[Long])
        : Either[String, Vector[(String, Long, Double)]] =
      doorGrid(chosen, fill, needed, fromS, toS).map { grid =>
        val names = chosen.map(i => s"${mNames(i)}/mean")
        val rg = ev(tree, RG(grid), names)
        val w = rg.rows.headOption.map(_._2.size).getOrElse(names.size)
        (0 until w).flatMap { c =>
          rg.rows.flatMap { case (b, cells) =>
            cells(c).collect {
              case v if !dropKeyword(fill) || (!v.isNaN && !v.isInfinite) =>
                (names(c), b, v)
            }
          }
        }.toVector.sortBy(t => (t._1, t._2))
      }

    // trees end AGGREGATED (single output series — the reference's
    // exact per-series output-drop path), optionally wrapped in a
    // rolling or resample on the aggregated series
    val ewBin = Vector("add", "sub", "mul", "div", "clip_min", "clip_max")
    def genEw(chosen: Vector[Int], depth: Int): Node = {
      def leafN = MetricLeaf(chosen.map(i => (mNames(i), "mean")))
      if (depth == 0) leafN
      else rnd.nextInt(4) match {
        case 0 => Bin(Parser.binOps(ewBin(rnd.nextInt(ewBin.size))),
          genEw(chosen, depth - 1), Num(nums(rnd.nextInt(nums.size))))
        case 1 => Un(unOpsGen(rnd.nextInt(unOpsGen.size)),
          genEw(chosen, depth - 1))
        case 2 => Clip(genEw(chosen, depth - 1), Num(-1.0), Num(3.0))
        case 3 => leafN
      }
    }
    def genDoorTree(chosen: Vector[Int]): Node = {
      val top = AggAcross(acrossAggs(rnd.nextInt(acrossAggs.size)),
        genEw(chosen, rnd.nextInt(3)))
      rnd.nextInt(5) match {
        case 0 => Rolling(acrossAggs(rnd.nextInt(acrossAggs.size)),
          1 + rnd.nextInt(3), top)
        case 1 => Resample(resampleAggs(rnd.nextInt(resampleAggs.size)),
          Granularity.seconds(if (rnd.nextBoolean()) 120 else 300), top)
        case _ => top
      }
    }

    var failures = List.empty[String]
    for (k <- 1 to 200) {
      val chosen = rnd.shuffle(mNames.indices.toVector)
        .take(1 + rnd.nextInt(3)).sorted
      val tree = genDoorTree(chosen)
      val fill = rnd.nextInt(10) match {
        case 0 | 9 => None
        case 1 => Some("null")
        case 2 => Some("dropna")
        case 3 => Some("ffill")
        case 4 => Some("bfill")
        case 5 => Some("full_ffill")
        case 6 => Some("full_bfill")
        case 7 => Some("0")
        case 8 => Some("2.5")
      }
      val needed: Option[Double] =
        if (fill.isEmpty) Vector[Option[Double]](None, Some(0.0), Some(25.0),
          Some(50.0), Some(75.0), Some(100.0))(rnd.nextInt(6))
        else if (rnd.nextInt(5) == 0) Some(50.0) // the fill-set gate: ignored
        else None
      // UNALIGNED bounds too: `from` must floor to the granularity
      // (A12), `to` stays a raw exclusive bound
      val f0 = if (rnd.nextInt(10) < 3)
        Some(rnd.nextInt(nBuckets).toLong * 60 + rnd.nextInt(2) * 30) else None
      val t0 = if (rnd.nextInt(10) < 3)
        Some((1 + rnd.nextInt(nBuckets)).toLong * 60 + rnd.nextInt(2) * 30)
      else None
      val (fromS, toS) = (f0, t0) match {
        case (Some(f), Some(t)) if t <= f => (Some(t - 60), Some(f + 60))
        case other => other
      }
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      val desc = s"#$k ${render(tree)} fill=$fill needed=$needed " +
        s"from=$fromS to=$toS refs=${chosen.map(mNames)}"
      val want = doorRef(tree, chosen, fill, needed, fromS, toS)
      val got: Either[String, Vector[(Long, Option[Double])]] =
        try {
          val df = g.aggregates(render(tree), 60L, fill, needed,
            fromS.map(ts), toS.map(ts))
          val vCol = df.columns.filterNot(_ == "bucket").head
          Right(df.orderBy("bucket").collect().toVector.map { r =>
            (r.getAs[java.sql.Timestamp]("bucket").getTime / 1000,
              if (r.isNullAt(r.fieldIndex(vCol))) None
              else Some(r.getDouble(r.fieldIndex(vCol))))
          })
        } catch {
          case e: IllegalArgumentException if e.getMessage != null &&
              e.getMessage.startsWith("Unable to aggregate") =>
            Left(e.getMessage)
          case e: Throwable =>
            failures ::= s"$desc ENGINE THREW: ${e.getMessage}"
            Left("__threw__")
        }
      (want, got) match {
        case (_, Left("__threw__")) => ()
        case (Left(_), Left(_))     => ()
        case (Left(w), Right(r))    =>
          failures ::= s"$desc: reference errors ($w), engine returned $r"
        case (Right(w), Left(e))    =>
          failures ::= s"$desc: engine errors ($e), reference returned $w"
        case (Right(w), Right(r))   =>
          val ok = r.size == w.size && r.zip(w).forall {
            case ((gb, gc), (wb, wc)) => gb == wb && sameCell(gc, wc)
          }
          if (!ok)
            failures ::= s"$desc DIVERGED\n  engine: $r\n  reference: $w"
      }
    }
    // ---- refs fan-out arm: 100 NON-aggregated trees through
    // aggregatesRefs — per-series long output, per-series drops
    def sameTriple(a: (String, Long, Double), b: (String, Long, Double)) =
      a._1 == b._1 && a._2 == b._2 &&
        ((a._3.isNaN && b._3.isNaN) || a._3 == b._3 ||
          math.abs(a._3 - b._3) <= 1e-9 * math.max(1.0,
            math.max(a._3.abs, b._3.abs)))
    for (k <- 1 to 100) {
      val chosen = rnd.shuffle(mNames.indices.toVector)
        .take(1 + rnd.nextInt(3)).sorted
      val base = genEw(chosen, 1 + rnd.nextInt(2))
      val tree = rnd.nextInt(4) match {
        case 0 => Rolling(acrossAggs(rnd.nextInt(acrossAggs.size)),
          1 + rnd.nextInt(3), base)
        case 1 => Resample(resampleAggs(rnd.nextInt(resampleAggs.size)),
          Granularity.seconds(if (rnd.nextBoolean()) 120 else 300), base)
        case 2 => RateOfChange(rnd.nextBoolean(), base)
        case _ => base
      }
      val fill = rnd.nextInt(9) match {
        case 0 | 8 => None
        case 1 => Some("null")
        case 2 => Some("dropna")
        case 3 => Some("ffill")
        case 4 => Some("bfill")
        case 5 => Some("full_ffill")
        case 6 => Some("full_bfill")
        case 7 => Some("0")
      }
      val needed: Option[Double] =
        if (fill.isEmpty) Vector[Option[Double]](None, Some(0.0), Some(50.0),
          Some(100.0))(rnd.nextInt(4))
        else None
      // UNALIGNED bounds too: `from` must floor to the granularity
      // (A12), `to` stays a raw exclusive bound
      val f0 = if (rnd.nextInt(10) < 3)
        Some(rnd.nextInt(nBuckets).toLong * 60 + rnd.nextInt(2) * 30) else None
      val t0 = if (rnd.nextInt(10) < 3)
        Some((1 + rnd.nextInt(nBuckets)).toLong * 60 + rnd.nextInt(2) * 30)
      else None
      val (fromS, toS) = (f0, t0) match {
        case (Some(f), Some(t)) if t <= f => (Some(t - 60), Some(f + 60))
        case other => other
      }
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      val desc = s"refs#$k ${render(tree)} fill=$fill needed=$needed " +
        s"from=$fromS to=$toS refs=${chosen.map(mNames)}"
      val want = doorRefRefs(tree, chosen, fill, needed, fromS, toS)
      val got: Either[String, Vector[(String, Long, Double)]] =
        try {
          val df = g.aggregatesRefs(render(tree), 60L, fill, needed,
            fromS.map(ts), toS.map(ts))
          Right(df.collect().toVector.map { r =>
            (r.getAs[String]("metric_id") + "/" + r.getAs[String]("method"),
              r.getAs[java.sql.Timestamp]("bucket").getTime / 1000,
              r.getAs[Double]("value"))
          }.sortBy(t => (t._1, t._2)))
        } catch {
          case e: IllegalArgumentException if e.getMessage != null &&
              e.getMessage.startsWith("Unable to aggregate") =>
            Left(e.getMessage)
          case e: Throwable =>
            failures ::= s"$desc ENGINE THREW: ${e.getMessage}"
            Left("__threw__")
        }
      (want, got) match {
        case (_, Left("__threw__")) => ()
        case (Left(_), Left(_))     => ()
        case (Left(w), Right(r))    =>
          failures ::= s"$desc: reference errors ($w), engine returned $r"
        case (Right(w), Left(e))    =>
          failures ::= s"$desc: engine errors ($e), reference returned $w"
        case (Right(w), Right(r))   =>
          val ok = r.size == w.size && r.zip(w).forall {
            case (a, b) => sameTriple(a, b)
          }
          if (!ok)
            failures ::= s"$desc DIVERGED\n  engine: $r\n  reference: $w"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} door divergences (seed $seed):\n" +
        failures.reverse.take(5).mkString("\n"))
  }
}
