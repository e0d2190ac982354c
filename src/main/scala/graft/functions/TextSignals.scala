package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing EVERY text-analysis signal in
  * ONE pass over the string (graft.llm.TextAnalysis consumes it).
  *
  * The Column formulation of these signals needs `split` into an array
  * plus several higher-order functions (`filter`, `aggregate`) — HOFs
  * are interpreted per element with lambda-variable binding, the array
  * materializes per document, and the text is traversed ~6 times
  * (split, punct regexp_replace, stopword filter, two aggregates,
  * boundary split). This expression is a single scan with no
  * allocation beyond the 7-field result row, and `doGenCode` emits one
  * static call so it stays inside whole-stage codegen.
  *
  * Field semantics replicate the Column formulation EXACTLY, quirks
  * included (pinned by TextSignalsPropertySpec differential tests):
  *   - words = `split(trim(text), "\\s+")`: Spark trim removes ONLY
  *     ' ' spaces, so a leading tab/newline yields a leading empty
  *     token that counts into n_words, and a trailing tab/newline a
  *     trailing empty token (Spark split keeps trailing empties,
  *     unlike Java's String.split — DuckDB string_split_regex agrees
  *     with Spark here, pinned by TextSignalsSpec);
  *   - pieces = `split(text, "(?<=\\W)|(?=\\W)")` filtered on
  *     `trim(p)` nonempty: every `\W` char is its own piece; only
  *     ' ' pieces are dropped (tabs/newlines count);
  *   - punct is the ASCII `\p{Punct}` class; word chars are `\w` =
  *     [A-Za-z0-9_]; whitespace is Java regex `\s` (6 ASCII chars);
  *   - lengths count codepoints (UTF8String.numChars semantics).
  */
case class TextSignals(child: Expression) extends UnaryExpression {

  // AbstractDataType is private[sql] in Spark 4, so ExpectsInputTypes
  // can't be mixed in from outside — check the input type directly.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_signals requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = TextSignals.schema
  override def prettyName: String = "text_signals"

  override def nullSafeEval(input: Any): Any =
    TextSignals.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSignals.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextSignals =
    copy(child = newChild)
}

object TextSignals {

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType),
    StructField("n_chars", IntegerType),
    StructField("n_punct", IntegerType),
    StructField("n_stop", IntegerType),
    StructField("word_len_sum", IntegerType),
    StructField("pieces", IntegerType),
    StructField("long_word_extra", IntegerType)))

  /** C4-style English stopword list (the canonical copy — the quality
    * oracles in Oracles.scala inline the same 17 words). */
  val stopwordsEn: Array[String] = Array("the", "a", "an", "and", "or",
    "of", "to", "in", "is", "was", "it", "for", "on", "with", "as",
    "at", "by")

  @inline private def isWs(cp: Int): Boolean = // Java regex \s (ASCII)
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' ||
      cp == '\r'
  @inline private def isWord(cp: Int): Boolean = // Java regex \w (ASCII)
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
      (cp >= '0' && cp <= '9') || cp == '_'
  @inline private def isPunct(cp: Int): Boolean = // \p{Punct} (ASCII)
    (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
      (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~')
  @inline private def asciiLower(cp: Int): Int =
    if (cp >= 'A' && cp <= 'Z') cp + 32 else cp

  /** One scan over the text; called per row from generated code. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    // space-only trim bounds (Spark/Java trim of ' ' specifically)
    var lo = 0
    while (lo < n && s.charAt(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1

    var nChars = 0; var nPunct = 0; var pieces = 0
    var inWordRun = false
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (isPunct(cp)) nPunct += 1
      if (isWord(cp)) {
        if (!inWordRun) { pieces += 1; inWordRun = true }
      } else {
        inWordRun = false
        // every \W char is its own piece; Java regex lookarounds match
        // BETWEEN the surrogates of a supplementary codepoint, so a
        // non-word astral char (emoji) splits into 2 one-surrogate
        // pieces (pinned by TextSignalsSpec)
        if (cp != ' ') pieces += (if (cp > 0xFFFF) 2 else 1)
      }
      i += Character.charCount(cp)
    }

    // words over the space-trimmed region: tokens are maximal non-\s
    // runs; a leading \s char (tab/newline the trim left behind) adds
    // one empty leading token and a trailing one adds one empty
    // trailing token (Spark split keeps both; Java split would drop
    // the trailing one)
    var nWords = 0; var nStop = 0; var lenSum = 0; var longExtra = 0
    if (hi > lo) {
      if (isWs(s.codePointAt(lo))) nWords += 1 // leading empty token
      if (isWs(s.charAt(hi - 1))) nWords += 1  // trailing empty token
      var j = lo
      val wordCp = new Array[Int](8) // stopwords are short; overflow = no match
      while (j < hi) {
        var cp = s.codePointAt(j)
        if (isWs(cp)) { j += Character.charCount(cp) }
        else {
          var wlen = 0
          while (j < hi && { cp = s.codePointAt(j); !isWs(cp) }) {
            if (wlen < wordCp.length) wordCp(wlen) = asciiLower(cp)
            wlen += 1
            j += Character.charCount(cp)
          }
          nWords += 1
          lenSum += wlen
          if (wlen > 4) longExtra += (wlen - 1) / 4
          if (wlen <= 4) { // longest stopword has 4 codepoints
            var k = 0
            var hit = false
            while (k < stopwordsEn.length && !hit) {
              val sw = stopwordsEn(k)
              if (sw.length == wlen) {
                var m = 0
                while (m < wlen && sw.charAt(m) == wordCp(m)) m += 1
                hit = m == wlen
              }
              k += 1
            }
            if (hit) nStop += 1
          }
        }
      }
    }

    new GenericInternalRow(Array[Any](nWords, nChars, nPunct, nStop,
      lenSum, pieces, longExtra))
  }
}

/** Session extension registering the native functions for SQL and
  * `call_function` use; injected by `SparkEntry.configure`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((new FunctionIdentifier("text_signals"),
      new ExpressionInfo("graft.functions.TextSignals", "text_signals"),
      (children: Seq[Expression]) => TextSignals(children.head)))
    ext.injectFunction((new FunctionIdentifier("repetition_signals"),
      new ExpressionInfo("graft.functions.RepetitionSignals",
        "repetition_signals"),
      (children: Seq[Expression]) => RepetitionSignals(children.head)))
    ext.injectFunction((new FunctionIdentifier("vec_dot"),
      new ExpressionInfo("graft.functions.VecDot", "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo("graft.functions.MinhashSig", "minhash_sig"),
      (children: Seq[Expression]) => MinhashSig(children(0), children(1))))
    ext.injectFunction((new FunctionIdentifier("vec_top_cells"),
      new ExpressionInfo("graft.functions.VecTopCells", "vec_top_cells"),
      (children: Seq[Expression]) => {
        require(children(1).foldable,
          "vec_top_cells: centroid table must be a plan-time literal")
        val arr = children(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val st = children(1).dataType.asInstanceOf[ArrayType]
          .elementType.asInstanceOf[StructType]
        // validate the centroid element type up front — toDoubleArray
        // below would otherwise fail with an opaque cast error
        require(st.fields(1).dataType == ArrayType(DoubleType, false) ||
            st.fields(1).dataType == ArrayType(DoubleType, true),
          s"vec_top_cells: centroids must be ARRAY<DOUBLE>, got " +
            st.fields(1).dataType.catalogString)
        val n = arr.numElements()
        val cells = new Array[Int](n)
        val cents = new Array[Array[Double]](n)
        var i = 0
        while (i < n) {
          val row = arr.getStruct(i, st.length)
          cells(i) = row.getInt(0)
          cents(i) = row.getArray(1).toDoubleArray()
          i += 1
        }
        VecTopCells(children(0), cells, cents,
          children(2).eval().asInstanceOf[Number].intValue())
      }))
    // plan-time-literal arguments get the same clear require as
    // vec_top_cells — a raw eval() on an unbound attribute would
    // surface as an opaque internal Catalyst error
    def lit0(children: Seq[Expression], i: Int, fn: String): Expression = {
      require(children(i).foldable,
        s"$fn: argument ${i + 1} must be a plan-time literal")
      children(i)
    }
    ext.injectFunction((new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo("graft.functions.BloomContains", "bloom_contains"),
      (children: Seq[Expression]) => BloomContains(children(0),
        lit0(children, 1, "bloom_contains").eval()
          .asInstanceOf[Array[Byte]])))
    ext.injectFunction((new FunctionIdentifier("pq_encode"),
      new ExpressionInfo("graft.functions.PqEncode", "pq_encode"),
      (children: Seq[Expression]) =>
        PqEncode(children(0),
          PqCodec.parseBooks(lit0(children, 1, "pq_encode")))))
    ext.injectFunction((new FunctionIdentifier("pq_adc_table"),
      new ExpressionInfo("graft.functions.PqAdcTable", "pq_adc_table"),
      (children: Seq[Expression]) =>
        PqAdcTable(children(0),
          PqCodec.parseBooks(lit0(children, 1, "pq_adc_table")))))
    ext.injectFunction((new FunctionIdentifier("lsh_keys"),
      new ExpressionInfo("graft.functions.LshKeys", "lsh_keys"),
      (children: Seq[Expression]) => LshKeys(children(0),
        lit0(children, 1, "lsh_keys").eval()
          .asInstanceOf[Number].intValue(),
        lit0(children, 2, "lsh_keys").eval()
          .asInstanceOf[Number].intValue())))
    ext.injectFunction((new FunctionIdentifier("remove_spans"),
      new ExpressionInfo("graft.functions.RemoveSpans", "remove_spans"),
      (children: Seq[Expression]) => RemoveSpans(children(0), children(1),
        lit0(children, 2, "remove_spans").eval()
          .asInstanceOf[Number].intValue())))
  }
}
