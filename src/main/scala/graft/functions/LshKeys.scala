package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `tables` random-hyperplane LSH bucket keys of an `array<double>`
  * vector in ONE fused pass — the multi-table OR-amplification kernel
  * of `Similarity.lshTopK` / `Dedup.embeddingNearDup`.
  *
  * The per-table Column formulation (`tables × nbits` separate
  * `vec_dot(vec, literal-hyperplane)` calls OR-ed into bucket longs)
  * has two scale problems this expression removes:
  *   - per-call evaluation overhead dominates the actual flops
  *     (384 expression evals per row at the 24×16 default);
  *   - the expression TREE is enormous, and janino compile time of the
  *     generated code (seconds per plan, uncached across stages)
  *     swamps small inputs.
  * Here the whole key set is one static call: a dim×(tables·nbits)
  * multiply-accumulate loop over a cached ±1 sign table, emitted as a
  * tight JIT-friendly loop.
  *
  * Bit-exactness: table `t`'s bit `b` is `Σ_i v(i)·sign(t,b,i) > 0`
  * with the sum accumulated in ascending `i` — the same left fold the
  * `vec_dot` formulation computes — and `sign` replays
  * `Similarity.hyperplane`'s XXH64-parity derivation exactly, so every
  * bucket key (and every oracle-pinned recall count) is unchanged.
  */
case class LshKeys(child: Expression, nbits: Int, tables: Int)
  extends UnaryExpression {

  require(nbits >= 1 && nbits <= 63, s"nbits out of range: $nbits")
  require(tables >= 1, s"tables out of range: $tables")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_keys requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_keys"

  override def nullSafeEval(v: Any): Any =
    LshKeys.compute(v.asInstanceOf[ArrayData], nbits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.LshKeys.compute($v, $nbits, $tables)")

  override protected def withNewChildInternal(c: Expression): LshKeys =
    copy(child = c)
}

object LshKeys {

  /** ±1 sign table for (nbits, tables, dim), dim-major so the inner
    * accumulate loop is contiguous: signs(i*P + (t*nbits + b)) with
    * P = tables·nbits. Derivation replays Similarity.hyperplane
    * (seed = table index): XXH64 parity of (i, (b, (t, 42))). */
  private val cache = new ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def signs(nbits: Int, tables: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((nbits, tables, dim), _ => {
      val p = nbits * tables
      val s = new Array[Double](dim * p)
      var t = 0
      while (t < tables) {
        val ht = XXH64.hashInt(t, 42L)
        var b = 0
        while (b < nbits) {
          val hb = XXH64.hashInt(b, ht)
          var i = 0
          while (i < dim) {
            val h = XXH64.hashInt(i, hb)
            s(i * p + t * nbits + b) =
              if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
            i += 1
          }
          b += 1
        }
        t += 1
      }
      s
    })

  /** Per-row scratch accumulator, reused across rows per thread. */
  private val scratch = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] = new Array[Double](0)
  }

  /** Called per row from generated code. */
  def compute(v: ArrayData, nbits: Int, tables: Int): ArrayData = {
    val dim = v.numElements()
    val p = nbits * tables
    val s = signs(nbits, tables, dim)
    var acc = scratch.get()
    if (acc.length < p) { acc = new Array[Double](p); scratch.set(acc) }
    var j = 0
    while (j < p) { acc(j) = 0.0; j += 1 }
    var i = 0
    while (i < dim) {
      val vi = v.getDouble(i)
      val base = i * p
      var k = 0
      while (k < p) { acc(k) += vi * s(base + k); k += 1 }
      i += 1
    }
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < nbits) {
        // Spark's GreaterThan orders NaN as LARGEST (SQLOrderingUtil),
        // so the Column formulation sets the bit for a NaN projection;
        // bare Java `NaN > 0` is false — match Spark for bit-exactness
        val v = acc(t * nbits + b)
        if (v > 0 || java.lang.Double.isNaN(v)) key |= (1L << b)
        b += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }
}
