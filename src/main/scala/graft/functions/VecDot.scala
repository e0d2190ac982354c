package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<double>` columns.
  *
  * The `zip_with` + `aggregate` Column formulation evaluates an
  * INTERPRETED lambda per element — for ANN workloads that is billions
  * of lambda frames (160k vectors × 24 tables × 16 hyperplanes × dim 64
  * ≈ 4·10⁹ for one LSH bucketing pass, measured 33 s). This expression
  * is one fused JVM loop emitted as a static call inside whole-stage
  * codegen.
  *
  * Summation is the same left fold (`acc + a(i)·b(i)` in index order)
  * as the HOF formulation, so results are bit-identical — the ANN
  * recall goldens pinned by the sf0.01 oracle do not move. Iteration
  * stops at the shorter array (the HOF formulation would yield NULL on
  * mismatched dimensions; no call site mixes dimensions).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDot.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Called per row from generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
