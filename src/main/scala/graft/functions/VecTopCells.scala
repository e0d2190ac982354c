package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** The `n` nearest centroids of an `array<double>` vector by cosine,
  * as `array<struct<cell:int, cosine:double>>` ordered (cosine desc,
  * cell asc) — the k-means assignment / IVF cell-probe kernel.
  *
  * The Column formulation (`crossJoin(broadcast(centroids))` + argmax
  * aggregate or window) materializes |corpus|·nlist rows each carrying
  * the full vector AND pays a per-vector shuffle for the argmax. At
  * nlist = 256 over 160k × dim-64 vectors that is ~40 GB through the
  * projection for 2.6 GFLOP of actual work. Here the whole argmax is
  * one fused per-row loop over a plan-time centroid matrix: no row
  * amplification, no shuffle — assignment becomes a narrow projection.
  *
  * Ordering parity with the Column formulation (oracle-pinned): cosine
  * compare is `a == b ? 0 : Double.compare(a, b)` — Spark's
  * SQLOrderingUtil double semantics (NaN greatest, ±0.0 equal) — with
  * ties broken by cell ascending, identical to the
  * `(cdist desc, cell asc)` window sort and the `(cdist, -cell)` max
  * key. The dot/norm arithmetic replays `cosine()`'s exact fold order:
  * `dot(v,c) / (sqrt(dot(v,v)) * sqrt(dot(c,c)))`, left-to-right.
  */
case class VecTopCells(child: Expression, cells: Array[Int],
                       cents: Array[Array[Double]], n: Int)
  extends UnaryExpression {

  require(cells.length == cents.length && cells.nonEmpty,
    s"vec_top_cells: ${cells.length} cell ids vs ${cents.length} centroids")

  // content equality over the centroid arrays (see BloomContains) —
  // reference equality would defeat plan-cache hits and CSE
  override def equals(other: Any): Boolean = other match {
    case VecTopCells(c, ce, cn, k) => c == child && k == n &&
      java.util.Arrays.equals(ce, cells) &&
      java.util.Arrays.deepEquals(cn.asInstanceOf[Array[AnyRef]],
        cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * child.hashCode() + n) * 31 + java.util.Arrays.hashCode(cells)) *
      31 + java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])
  require(n >= 1, s"vec_top_cells: n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_top_cells requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cell", IntegerType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "vec_top_cells"

  /** Centroid norms, precomputed once per plan (same sqrt(dot(c,c))
    * value the per-row formulation recomputes). */
  @transient private lazy val norms: Array[Double] =
    cents.map(c => math.sqrt(VecTopCells.dotSelf(c)))

  override def nullSafeEval(v: Any): Any =
    VecTopCells.compute(v.asInstanceOf[ArrayData], cells, cents, norms, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VecTopCells.compute($v, $cellsRef, $centsRef, $normsRef, $n)")
  }

  override protected def withNewChildInternal(c: Expression): VecTopCells =
    copy(child = c)
}

object VecTopCells {

  private[functions] def dotSelf(c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** Spark SQLOrderingUtil double compare: ±0.0 equal, NaN greatest. */
  private def cmpD(a: Double, b: Double): Int = DoubleOrder.cmpD(a, b)

  /** Called per row from generated code. */
  def compute(v: ArrayData, cells: Array[Int], cents: Array[Array[Double]],
              norms: Array[Double], n: Int): ArrayData = {
    val dim = v.numElements()
    var nv = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); nv += x * x; i += 1 }
    nv = math.sqrt(nv)
    val k = math.min(n, cells.length)
    // insertion top-k over (cosine desc, cell asc)
    val bestCos = new Array[Double](k)
    val bestCell = new Array[Int](k)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(dim, cent.length)
      var d = 0.0
      i = 0
      while (i < m) { d += v.getDouble(i) * cent(i); i += 1 }
      val cos = d / (nv * norms(c))
      val cell = cells(c)
      // find insert position among the filled prefix
      var pos = filled
      while (pos > 0 && {
        val cc = cmpD(cos, bestCos(pos - 1))
        cc > 0 || (cc == 0 && cell < bestCell(pos - 1))
      }) pos -= 1
      if (pos < k) {
        val last = math.min(filled, k - 1)
        var j = last
        while (j > pos) {
          bestCos(j) = bestCos(j - 1); bestCell(j) = bestCell(j - 1); j -= 1
        }
        bestCos(pos) = cos
        bestCell(pos) = cell
        if (filled < k) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      out(r) = InternalRow(bestCell(r), bestCos(r))
      r += 1
    }
    new GenericArrayData(out)
  }
}
