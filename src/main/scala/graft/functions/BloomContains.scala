package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership test of a LONG key against a plan-time Bloom filter —
  * the sketch analogue of a broadcast hash-set semi-join. At 100 TB
  * the standing dedup index over content hashes no longer fits as an
  * exact set, but a ~1.2 GB Bloom filter at 10⁹ keys / 1% fpp still
  * broadcasts; the membership probe is then a narrow per-row filter
  * with NO join or shuffle on the batch side.
  *
  * The filter bytes ride in the expression (reference object in
  * codegen); deserialization happens once per executor via the lazy
  * val, not per row. Spark's sketch BloomFilter is deterministic: bit
  * positions are a pure function of the key and merges OR bitmaps, so
  * any partitioning/order of the build yields the same filter.
  */
case class BloomContains(child: Expression, filterBytes: Array[Byte])
  extends UnaryExpression {

  // case-class equals on an Array field is REFERENCE equality — two
  // expressions built from identical filter bytes would never compare
  // equal, defeating canonicalized-plan cache hits and CSE. Compare by
  // content instead.
  override def equals(other: Any): Boolean = other match {
    case BloomContains(c, fb) =>
      c == child && java.util.Arrays.equals(fb, filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)

  @transient private lazy val filter: BloomFilter =
    BloomContains.deserialize(filterBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires BIGINT, got ${t.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", filterBytes, "byte[]")
    val f = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "bloomFilter",
      v => s"$v = graft.functions.BloomContains.deserialize($bytesRef);")
    defineCodeGen(ctx, ev, v => s"$f.mightContainLong($v)")
  }

  override protected def withNewChildInternal(c: Expression): BloomContains =
    copy(child = c)
}

object BloomContains {
  /** Called once per executor from generated-code init. */
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
