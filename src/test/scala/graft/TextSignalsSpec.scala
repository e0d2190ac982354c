package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Differential tests for the native single-pass
  * [[graft.functions.TextSignals]] expression: every field must agree
  * with an independent Column (HOF) formulation of the same signal on
  * arbitrary text, quirks included (space-only trim, leading-empty
  * token, tab/newline pieces, codepoint lengths). This is the spec the
  * TextSignals scaladoc promises.
  */
class TextSignalsSpec extends SparkSpec {

  private val stop = graft.functions.TextSignals.stopwordsEn.toSeq

  /** The original multi-pass Column formulation, field by field. */
  private def columnSignals(t: Column): Column = {
    val words = split(trim(t), "\\s+")
    val nWords = when(length(trim(t)) === 0, 0).otherwise(size(words))
    val nChars = length(t)
    val nPunct = nChars - length(regexp_replace(t, "\\p{Punct}", ""))
    val nStop = when(length(trim(t)) === 0, 0).otherwise(
      size(filter(words, w => lower(w).isin(stop: _*))))
    val wordLenSum = when(length(trim(t)) === 0, 0).otherwise(
      aggregate(words, lit(0), (acc, w) => acc + length(w)))
    val pieces = size(filter(split(t, "(?<=\\W)|(?=\\W)"),
      p => trim(p) =!= ""))
    val longExtra = when(length(trim(t)) === 0, 0).otherwise(
      aggregate(words, lit(0), (acc, w) =>
        acc + when(length(w) > 4,
          floor((length(w) - 1) / lit(4.0)).cast("int")).otherwise(0)))
    struct(nWords.as("n_words"), nChars.as("n_chars"),
      nPunct.as("n_punct"), nStop.as("n_stop"),
      wordLenSum.as("word_len_sum"), pieces.as("pieces"),
      longExtra.as("long_word_extra"))
  }

  private def diff(texts: Seq[String]): Seq[(String, String, String)] = {
    val s = spark
    import s.implicits._
    texts.toDF("t")
      .select(col("t"), call_function("text_signals", col("t")).as("native"),
        columnSignals(col("t")).as("ref"))
      .where(col("native") =!= col("ref"))
      .collect()
      .map(r => (r.getString(0), r.get(1).toString, r.get(2).toString))
      .toSeq
  }

  test("hand-picked edge cases agree with the Column formulation") {
    val cases = Seq(
      "", " ", "   ", "\t", "\n", " \t ", "\t hello", "\nx",
      "hello world", "the quick brown fox", "The, quick; brown!",
      "a  b   c", " leading", "trailing ", "  both  ",
      "word\tword", "line1\nline2", "crlf\r\nnext",
      "punct!!!", "___", "a_b", "42 7 digits99",
      "internationalization", "supercalifragilisticexpialidocious",
      "café naïve", "你好世界",
      "emoji 😀 here", "mixéd wörds and the of",
      "a" * 23, ("ab " * 40).trim, "vtab", "\fformfeed",
      "THE A AN AND", "is was it for on with as at by",
      "semi;colon:colon,comma.dot", "(parens) [brackets] {braces}",
      "tab\tand  double  space", "\t\n", " \t\n ")
    val bad = diff(cases)
    assert(bad.isEmpty, s"native != column on: ${bad.take(5)}")
  }

  test("property: native signals equal Column signals on arbitrary text") {
    val token = Gen.oneOf(
      Gen.oneOf(stop),
      Gen.choose(1, 12).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)),
      Gen.oneOf("café", "你好", "😀", "straße"),
      Gen.nonEmptyListOf(Gen.oneOf("!,.;:?()[]'\"-_".toSeq))
        .map(_.mkString))
    val sep = Gen.nonEmptyListOf(Gen.oneOf(' ', ' ', ' ', '\t', '\n',
      '\r', '\f', '')).map(_.mkString)
    val genText = for {
      lead <- Gen.oneOf(Gen.const(""), sep)
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(n, sep)
      tail <- Gen.oneOf(Gen.const(""), sep)
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }
      .mkString + tail

    // batch the samples into single Spark jobs: collect 40 texts per
    // property evaluation instead of one job per string
    val prop = Prop.forAll(Gen.listOfN(40, genText)) { texts =>
      diff(texts).isEmpty
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
