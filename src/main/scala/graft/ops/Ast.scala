package graft.ops

import graft.model.Granularity

/** AST of the cross-metric expression DSL (`/v1/aggregates` in the
  * reference; grammar at gnocchi/rest/aggregates/api.py:74-139,
  * interpreter at gnocchi/rest/aggregates/operations.py:331-365).
  *
  * String form is an s-expression, e.g.
  *   `(* 4 (rolling sum 2 (metric m1 max)))`
  *   `(aggregate mean (metric (m1 mean) (m2 mean)))`
  *
  * We compile the AST to a Spark logical plan over an aligned grid
  * instead of interpreting over a numpy matrix.
  */
sealed trait Node

/** Scalar literal operand. */
final case class Num(v: Double) extends Node

/** `(metric name agg)` or `(metric (m1 agg1) (m2 agg2) ...)` leaf —
  * selects one or more series columns of the grid
  * (operations.py:355-362). */
final case class MetricLeaf(refs: Seq[(String, String)]) extends Node

/** Elementwise binary op (operations.py:58-106): series⊕series requires
  * identical timestamps (pairwise by column), series⊕scalar broadcasts.
  * Comparison ops yield 1.0/0.0 (numpy semantics). */
final case class Bin(op: String, left: Node, right: Node) extends Node

/** Ternary clip (operations.py:108-110). */
final case class Clip(sub: Node, lo: Node, hi: Node) extends Node

/** Unary elementwise op: abs/negative/cos/sin/tan/floor/ceil
  * (operations.py:113-125). */
final case class Un(op: String, sub: Node) extends Node

/** `rateofchange` / `rateofchangesec` (operations.py:128-141): diff along
  * the time axis, dropping the first timestamp. */
final case class RateOfChange(perSecond: Boolean, sub: Node) extends Node

/** `(aggregate <agg> <expr>)` — collapse across the metric axis per
  * timestamp (operations.py:232-240). NB numpy nanstd/nanvar here are
  * POPULATION (ddof=0) — contrast the archive-policy `std` kernel. */
final case class AggAcross(agg: String, sub: Node) extends Node

/** `(rolling <agg> <window> <expr>)` — trailing row-count window of
  * exactly `window` rows, emitted only from the window-th point
  * (operations.py:243-261). */
final case class Rolling(agg: String, window: Int, sub: Node) extends Node

/** `(resample <agg> <granularity> <expr>)` — per-column re-bucketing
  * (operations.py:264-280). */
final case class Resample(agg: String, granularity: Granularity, sub: Node)
    extends Node

object Parser {
  /** Binary operator aliases (operations.py:58-106). */
  val binOps: Map[String, String] = Map(
    "=" -> "eq", "==" -> "eq", "eq" -> "eq",
    "<" -> "lt", "lt" -> "lt", ">" -> "gt", "gt" -> "gt",
    "<=" -> "le", "≤" -> "le", "le" -> "le",
    ">=" -> "ge", "≥" -> "ge", "ge" -> "ge",
    "!=" -> "ne", "≠" -> "ne", "ne" -> "ne",
    "%" -> "mod", "mod" -> "mod",
    "+" -> "add", "add" -> "add", "-" -> "sub", "sub" -> "sub",
    "*" -> "mul", "×" -> "mul", "mul" -> "mul",
    "/" -> "div", "÷" -> "div", "div" -> "div",
    "**" -> "pow", "^" -> "pow", "pow" -> "pow",
    "clip_min" -> "clip_min", "clip_max" -> "clip_max", "max" -> "max2",
    "min" -> "min2")

  val unOps: Set[String] =
    Set("abs", "absolute", "neg", "negative", "cos", "sin", "tan", "floor", "ceil")

  /** Tokenize + parse the s-expression string form
    * (pyparsing.nestedExpr equivalent, rest/aggregates/api.py:129-139).
    */
  def parse(s: String): Node = {
    val toks = tokenize(s)
    val (node, rest) = parseNode(toks)
    require(rest.isEmpty, s"trailing tokens: $rest")
    node
  }

  private def tokenize(s: String): List[String] =
    s.replace("(", " ( ").replace(")", " ) ")
      .split("\\s+").filter(_.nonEmpty).toList

  private def parseNode(toks: List[String]): (Node, List[String]) = toks match {
    case "(" :: rest => parseForm(rest)
    case t :: rest if isNum(t) => (Num(t.toDouble), rest)
    case t => throw new IllegalArgumentException(s"unexpected tokens $t")
  }

  private def isNum(t: String): Boolean =
    t.matches("-?[0-9]+(\\.[0-9]+)?([eE]-?[0-9]+)?")

  // parse the inside of a "( ..." form
  private def parseForm(toks: List[String]): (Node, List[String]) = toks match {
    case "metric" :: rest =>
      rest match {
        case "(" :: _ => // multi-ref form: (metric (m1 a1) (m2 a2))
          var cur = rest
          val refs = scala.collection.mutable.ArrayBuffer[(String, String)]()
          while (cur.headOption.contains("(")) {
            cur match {
              case "(" :: m :: a :: ")" :: tail => refs += ((m, a)); cur = tail
              case _ => throw new IllegalArgumentException(s"bad metric ref: $cur")
            }
          }
          require(cur.headOption.contains(")"), "unclosed (metric ...)")
          // duplicate refs collapse at extraction, as the reference's
          // ReferencesList OrderedSet (rest/aggregates/api.py:142-152;
          // evaluate() then selects each matching column once,
          // operations.py:356-360) — a kept duplicate would also make
          // the pivoted grid column name ambiguous
          (MetricLeaf(refs.toSeq.distinct), cur.tail)
        case m :: a :: ")" :: tail => (MetricLeaf(Seq((m, a))), tail)
        case _ => throw new IllegalArgumentException(s"bad metric leaf: $rest")
      }
    case "aggregate" :: agg :: rest =>
      val (sub, r2) = parseNode(rest)
      expectClose(r2).map(t => (AggAcross(agg, sub), t)).get
    case "rolling" :: agg :: w :: rest =>
      val (sub, r2) = parseNode(rest)
      expectClose(r2).map(t => (Rolling(agg, w.toInt, sub), t)).get
    case "resample" :: agg :: g :: rest =>
      val (sub, r2) = parseNode(rest)
      expectClose(r2).map(t => (Resample(agg, Granularity.parse(g), sub), t)).get
    case "rateofchange" :: rest =>
      val (sub, r2) = parseNode(rest)
      expectClose(r2).map(t => (RateOfChange(perSecond = false, sub), t)).get
    case "rateofchangesec" :: rest =>
      val (sub, r2) = parseNode(rest)
      expectClose(r2).map(t => (RateOfChange(perSecond = true, sub), t)).get
    case "clip" :: rest =>
      val (sub, r1) = parseNode(rest)
      val (lo, r2) = parseNode(r1)
      val (hi, r3) = parseNode(r2)
      expectClose(r3).map(t => (Clip(sub, lo, hi), t)).get
    case op :: rest if unOps.contains(op) =>
      val (sub, r2) = parseNode(rest)
      expectClose(r2).map(t => (Un(op, sub), t)).get
    case op :: rest if binOps.contains(op) =>
      val (l, r1) = parseNode(rest)
      val (r, r2) = parseNode(r1)
      expectClose(r2).map(t => (Bin(binOps(op), l, r), t)).get
    case other => throw new IllegalArgumentException(s"unknown form: $other")
  }

  private def expectClose(toks: List[String]): Option[List[String]] = toks match {
    case ")" :: tail => Some(tail)
    case _ => throw new IllegalArgumentException(s"expected ) at $toks")
  }

  /** JSON form of the operations schema (rest/aggregates/api.py:74-126):
    * nested arrays with the same head-first shape as the s-expression
    * form, e.g. `["*", 4, ["metric", "m1", "mean"]]`. Both forms parse
    * to the same AST.
    */
  def parseJson(s: String): Node = {
    import org.json4s._
    fromJson(org.json4s.jackson.JsonMethods.parse(s))
  }

  private def fromJson(v: org.json4s.JValue): Node = {
    import org.json4s._
    v match {
      case JInt(n)     => Num(n.toDouble)
      case JLong(n)    => Num(n.toDouble)
      case JDouble(n)  => Num(n)
      case JDecimal(n) => Num(n.toDouble)
      case JArray(JString("metric") :: rest) =>
        val refs = rest match {
          case JString(m) :: JString(a) :: Nil => Seq((m, a))
          case pairs => pairs.map {
            case JArray(JString(m) :: JString(a) :: Nil) => (m, a)
            case other => throw new IllegalArgumentException(
              s"bad metric ref: $other")
          }
        }
        // same ReferencesList dedupe as the string form
        MetricLeaf(refs.distinct)
      case JArray(JString("aggregate") :: JString(agg) :: sub :: Nil) =>
        AggAcross(agg, fromJson(sub))
      case JArray(JString("rolling") :: JString(agg) :: w :: sub :: Nil) =>
        Rolling(agg, fromJson(w) match { case Num(n) => n.toInt
          case _ => throw new IllegalArgumentException("bad window") },
          fromJson(sub))
      case JArray(JString("resample") :: JString(agg) :: JString(g) :: sub :: Nil) =>
        Resample(agg, graft.model.Granularity.parse(g), fromJson(sub))
      case JArray(JString("rateofchange") :: sub :: Nil) =>
        RateOfChange(perSecond = false, fromJson(sub))
      case JArray(JString("rateofchangesec") :: sub :: Nil) =>
        RateOfChange(perSecond = true, fromJson(sub))
      case JArray(JString("clip") :: sub :: lo :: hi :: Nil) =>
        Clip(fromJson(sub), fromJson(lo), fromJson(hi))
      case JArray(JString(op) :: sub :: Nil) if unOps.contains(op) =>
        Un(op, fromJson(sub))
      case JArray(JString(op) :: l :: r :: Nil) if binOps.contains(op) =>
        Bin(binOps(op), fromJson(l), fromJson(r))
      case other => throw new IllegalArgumentException(s"unknown form: $other")
    }
  }
}
