package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native span-removal kernel for ExactSubstr-style dedup (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better":
  * duplicated spans are REMOVED from the corpus, not just scored).
  *
  * `remove_spans(words, starts, w)`: given a document's token array and
  * the SORTED 0-based start positions of its duplicated w-grams, drop
  * every token covered by some span `[start, start+w)` and return
  * `(clean, n_kept)` — the surviving tokens space-joined, in order.
  *
  * One merged pointer walk: O(words + starts) per document. The HOF
  * formulation (`filter` with an `exists` over starts, or an
  * `array_contains` on the expanded cover set) is interpreted per
  * element and quadratic for dup-heavy documents — exactly the rows
  * where a 100 TB dedup pass spends its time.
  */
case class RemoveSpans(words: Expression, starts: Expression, w: Int)
  extends BinaryExpression {

  override def left: Expression = words
  override def right: Expression = starts

  override def checkInputDataTypes(): TypeCheckResult =
    (words.dataType, starts.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if w > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "remove_spans requires (array<string>, array<int>, w > 0), got " +
          s"(${words.dataType.catalogString}, ${starts.dataType.catalogString}, $w)")
    }
  override def dataType: DataType = RemoveSpans.schema
  override def prettyName: String = "remove_spans"

  override def nullSafeEval(wordsA: Any, startsA: Any): Any =
    RemoveSpans.compute(wordsA.asInstanceOf[ArrayData],
      startsA.asInstanceOf[ArrayData], w)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
  : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.RemoveSpans.compute($a, $b, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveSpans =
    copy(words = newLeft, starts = newRight)
}

object RemoveSpans {

  val schema: StructType = StructType(Seq(
    StructField("clean", StringType),
    StructField("n_kept", IntegerType)))

  /** Merged walk over token positions and sorted span starts; called
    * from generated code.
    */
  def compute(words: ArrayData, starts: ArrayData, w: Int): InternalRow = {
    val n = words.numElements()
    val s = starts.numElements()
    val sb = new java.lang.StringBuilder
    var kept = 0
    var j = 0
    var coveredUntil = 0
    var i = 0
    while (i < n) {
      while (j < s && starts.getInt(j) <= i) {
        val e = starts.getInt(j) + w
        if (e > coveredUntil) coveredUntil = e
        j += 1
      }
      if (i >= coveredUntil) {
        if (kept > 0) sb.append(' ')
        sb.append(words.getUTF8String(i).toString)
        kept += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), kept))
  }
}
