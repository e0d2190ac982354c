package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused product-quantization kernels. The Column formulations build
  * m·k separate `vec_dot(slice(vec,…), literal-codebook-entry)` calls
  * per row (m subspaces × k codes) — per-call overhead and janino
  * compile time of the giant expression tree dominate the actual
  * flops, exactly like the pre-fusion LSH path. Each expression here
  * is one static call looping over an expression-embedded codebook.
  *
  * Arithmetic replays the Column formulation exactly (same left-fold
  * dot order, `n²(c) - 2.0·dot` distance, first-minimum tie-break via
  * Spark's double semantics — ±0.0 equal, NaN greatest), so every
  * pq code and ADC score is bit-identical to the unfused plan.
  */
object PqCodec {

  private def cmpD(a: Double, b: Double): Int = DoubleOrder.cmpD(a, b)

  /** books(s)(c) = centroid of code c in subspace s (uniform width). */
  type Books = Array[Array[Array[Double]]]

  private[functions] def parseBooks(e: Expression): Books = {
    require(e.foldable, "pq codebooks must be a plan-time literal")
    val outer = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { s =>
      val mid = outer.getArray(s)
      Array.tabulate(mid.numElements())(c => mid.getArray(c).toDoubleArray())
    }
  }

  /** ‖c‖² per (subspace, code), same Scala left-fold sum as the
    * Column formulation's plan-time `c.map(x => x*x).sum`. */
  private[functions] def sqNorms(books: Books): Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum))

  def encode(v: ArrayData, books: Books, n2: Array[Array[Double]]): ArrayData = {
    val m = books.length
    val codes = new Array[Int](m)
    var off = 0
    var s = 0
    while (s < m) {
      val book = books(s)
      val d = book(0).length
      var best = 0
      var bestDist = Double.NaN
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dot = 0.0
        var i = 0
        while (i < d) { dot += v.getDouble(off + i) * cent(i); i += 1 }
        val dist = n2(s)(c) - 2.0 * dot
        if (c == 0 || cmpD(dist, bestDist) < 0) { best = c; bestDist = dist }
        c += 1
      }
      codes(s) = best
      off += d
      s += 1
    }
    new GenericArrayData(codes)
  }

  def adcTable(v: ArrayData, books: Books): ArrayData = {
    val m = books.length
    val rows = new Array[Any](m)
    var off = 0
    var s = 0
    while (s < m) {
      val book = books(s)
      val d = book(0).length
      val dots = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dot = 0.0
        var i = 0
        while (i < d) { dot += v.getDouble(off + i) * cent(i); i += 1 }
        dots(c) = dot
        c += 1
      }
      rows(s) = new GenericArrayData(dots)
      off += d
      s += 1
    }
    new GenericArrayData(rows)
  }
}

/** `pq_encode(vec, books)` → `array<int>`: nearest code per subspace
  * by the `‖c‖² − 2·⟨sub,c⟩` rule (first minimum wins). */
case class PqEncode(child: Expression, books: PqCodec.Books)
  extends UnaryExpression {

  // content equality over the nested codebook arrays (see
  // BloomContains) — reference equality would defeat plan-cache hits
  override def equals(other: Any): Boolean = other match {
    case PqEncode(c, b) => c == child && java.util.Arrays.deepEquals(
      b.asInstanceOf[Array[AnyRef]], books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() +
    java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]])

  @transient private lazy val n2: Array[Array[Double]] = PqCodec.sqNorms(books)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any =
    PqCodec.encode(v.asInstanceOf[ArrayData], books, n2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
    val n2Ref = ctx.addReferenceObj("n2", n2, "double[][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.PqCodec.encode($v, $booksRef, $n2Ref)")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** `pq_adc_table(vec, books)` → `array<array<double>>`: per-subspace
  * dot products of the query's sub-vector with every codebook entry —
  * the asymmetric-distance lookup table. */
case class PqAdcTable(child: Expression, books: PqCodec.Books)
  extends UnaryExpression {

  override def equals(other: Any): Boolean = other match {
    case PqAdcTable(c, b) => c == child && java.util.Arrays.deepEquals(
      b.asInstanceOf[Array[AnyRef]], books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() +
    java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]])

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_table requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_table"

  override def nullSafeEval(v: Any): Any =
    PqCodec.adcTable(v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.PqCodec.adcTable($v, $booksRef)")
  }

  override protected def withNewChildInternal(c: Expression): PqAdcTable =
    copy(child = c)
}
