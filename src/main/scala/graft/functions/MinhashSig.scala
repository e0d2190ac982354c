package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature over an `array<long>` shingle-hash column:
  * the k per-function minima in one fused loop per row.
  *
  * Values are BIT-IDENTICAL to the explode + `min(xxhash64(h, lit(i)))`
  * aggregation formulation: Catalyst's `xxhash64(h, i)` chains
  * `XXH64.hashLong(i, XXH64.hashLong(h, seed=42))`, and this loop
  * replays exactly that chain — so band buckets, candidate sets, and
  * the dd2/dd6 oracle goldens do not move. What changes is the plan:
  * no explode (k× row amplification), no k-column-wide hash aggregate,
  * no signature shuffle — signatures become a map-stage array column
  * and only the banded candidates shuffle.
  *
  * `k` must be a foldable integer.
  */
case class MinhashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) if right.foldable &&
        right.dataType == IntegerType =>
      // validate k at ANALYSIS: a negative k would throw
      // NegativeArraySizeException per row at execution, and k = 0
      // silently yields empty signatures that die downstream with an
      // opaque ANSI element_at error in the banding stage
      val k = right.eval()
      if (k == null || k.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"minhash_sig: k must be a positive literal, got $k")
      else TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "minhash_sig requires (ARRAY<BIGINT>, foldable INT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any, k: Any): Any =
    MinhashSig.compute(a.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, k) => s"graft.functions.MinhashSig.compute($a, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSig =
    copy(left = newLeft, right = newRight)
}

object MinhashSig {
  /** Called per row from generated code. An empty shingle array yields
    * the all-Long.MaxValue signature (callers' exact-similarity verify
    * step discards the degenerate pairs it can produce — 0/0 Jaccard
    * is NULL and fails every threshold). */
  def compute(hashes: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val base = XXH64.hashLong(hashes.getLong(i), 42L)
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(j.toLong, base)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
