package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the repetition signals
  * (Gopher-style duplicate-line and top word-2-gram statistics) in ONE
  * pass per document.
  *
  * The Column formulation needs split-to-array plus higher-order
  * functions — `aggregate`/`transform` lambdas are INTERPRETED per
  * array element with variable binding and per-element struct
  * allocation, which measured ~10 s over the 32×-amplified documents
  * corpus (≈9 M interpreted lambda frames). This expression is one JVM
  * scan with a small open hash table per row and a `doGenCode` static
  * call, so it stays inside whole-stage codegen: same corpus ≈ 1 s.
  *
  * Field semantics replicate the Column formulation exactly:
  *   - lines = `split(text, "\n")` kept when `trim(line) != ""` (Spark
  *     trim removes ONLY ' ' — a tab-only line is non-blank);
  *     `n_dup_lines = n_lines - n_distinct_lines` on exact equality;
  *   - words = `split(normalized, " ")` where normalized =
  *     trim-collapse of `lower(text)` whitespace (Java regex \s,
  *     ASCII); lowercase = java.lang.String.toLowerCase (what
  *     UTF8String.toLowerCase does for non-ASCII);
  *   - 2-grams are consecutive word pairs in positional order;
  *     `top_gram` is the highest multiplicity, `n_grams` the total
  *     (= words - 1, 0 when fewer than 2 words).
  */
case class RepetitionSignals(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_signals requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = RepetitionSignals.schema
  override def prettyName: String = "repetition_signals"

  override def nullSafeEval(input: Any): Any =
    RepetitionSignals.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionSignals.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionSignals =
    copy(child = newChild)
}

object RepetitionSignals {

  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType),
    StructField("n_dup_lines", IntegerType),
    StructField("n_grams", IntegerType),
    StructField("top_gram", IntegerType)))

  @inline private def isWs(c: Char): Boolean = // Java regex \s (ASCII)
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** One scan per row; called from generated code. */
  def compute(text: UTF8String): InternalRow = {
    val raw = text.toString

    // ---- line signal: split on '\n', keep lines with any non-' ' char
    var nLines = 0
    var nDup = 0
    val seenLines = new java.util.HashMap[String, Integer]()
    var start = 0
    var i = 0
    val n = raw.length
    while (i <= n) {
      if (i == n || raw.charAt(i) == '\n') {
        // space-only trim check without materializing the trim
        var p = start
        while (p < i && raw.charAt(p) == ' ') p += 1
        if (p < i) { // non-blank after space-trim
          nLines += 1
          val line = raw.substring(start, i)
          if (seenLines.putIfAbsent(line, 1) != null) nDup += 1
        }
        start = i + 1
      }
      i += 1
    }

    // ---- 2-gram signal over lowercased, \s-tokenized text.
    // Locale.ROOT: the default-locale overload is machine-dependent
    // (Turkish-I), while Spark's lower() is locale-independent.
    val s = raw.toLowerCase(java.util.Locale.ROOT)
    val m = s.length
    var nGrams = 0
    var top = 0
    var prev: String = null
    val counts = new java.util.HashMap[String, Integer]()
    var j = 0
    while (j < m) {
      if (isWs(s.charAt(j))) j += 1
      else {
        val ws = j
        while (j < m && !isWs(s.charAt(j))) j += 1
        val w = s.substring(ws, j)
        if (prev != null) {
          nGrams += 1
          val key = prev + " " + w
          val c = counts.getOrDefault(key, 0) + 1
          counts.put(key, c)
          if (c > top) top = c
        }
        prev = w
      }
    }

    new GenericInternalRow(Array[Any](nLines, nDup, nGrams, top))
  }
}
