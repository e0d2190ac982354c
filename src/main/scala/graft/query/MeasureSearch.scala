package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** S1 measure-value threshold search (`POST /v1/search/metric`,
  * reference rest/api.py:1514-1652 `MeasureQuery`): a boolean tree of
  * comparisons whose operands may be arithmetic over the aggregated
  * value. Compiles to a single Catalyst predicate over the aggregate
  * frame — filter pushdown comes free.
  */
object MeasureSearch {

  sealed trait Expr
  case object Value extends Expr
  final case class Const(v: Double) extends Expr
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr

  sealed trait Pred
  final case class Cmp(op: String, l: Expr, r: Expr) extends Pred
  final case class And(ps: Seq[Pred]) extends Pred
  final case class Or(ps: Seq[Pred]) extends Pred
  final case class Not(p: Pred) extends Pred

  def compileExpr(e: Expr, value: Column): Column = e match {
    case Value => value
    case Const(v) => lit(v)
    case Arith(op, l, r) =>
      val (a, b) = (compileExpr(l, value), compileExpr(r, value))
      // full reference alias set (rest/api.py:1514-1540 binary_operators)
      op match {
        case "+" | "add"        => a + b
        case "-" | "sub"        => a - b
        case "*" | "×" | "mul"  => a * b
        // python operator.truediv raises ZeroDivisionError (a 500 in
        // the reference); under ANSI a bare `/` would likewise THROW on
        // the first zero divisor and abort the whole scan. Keep the
        // predicate total instead: 0-divisor yields NaN (same choice as
        // mod below), and NaN compares deterministically — and the same
        // way — in both Spark and the DuckDB oracle (above every value)
        case "/" | "÷" | "div"  =>
          when(b === 0, lit(Double.NaN)).otherwise(a / b)
        // python operator.mod (rest/api.py binary_operators): the
        // result takes the DIVISOR's sign — true floor-mod, because
        // pmod only corrects the negative-DIVIDEND case (pmod(7,-3)=1
        // while python 7 % -3 = -2); b=0 keeps pmod's NaN result
        // rather than python's ZeroDivisionError (a filter predicate
        // must not abort the scan)
        case "%" | "mod"        =>
          when(b === 0, lit(Double.NaN)).otherwise(a - floor(a / b) * b)
        case "**" | "^" | "pow" => pow(a, b)
        case other => throw new IllegalArgumentException(s"arith $other")
      }
  }

  def compile(p: Pred, value: Column): Column = p match {
    case Cmp(op, l, r) =>
      val (a, b) = (compileExpr(l, value), compileExpr(r, value))
      op match {
        case "=" | "==" | "eq"  => a === b
        case "<" | "lt"         => a < b
        case ">" | "gt"         => a > b
        case "<=" | "≤" | "le"  => a <= b
        case ">=" | "≥" | "ge"  => a >= b
        case "!=" | "≠" | "ne"  => a =!= b
        case other => throw new IllegalArgumentException(s"cmp $other")
      }
    // SQL identities on empty lists (no 500 on a REST {"and": []})
    case And(Nil) => lit(true)
    case Or(Nil)  => lit(false)
    case And(ps) => ps.map(compile(_, value)).reduce(_ && _)
    case Or(ps)  => ps.map(compile(_, value)).reduce(_ || _)
    case Not(q)  => !compile(q, value)
  }
}
