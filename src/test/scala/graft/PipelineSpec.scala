package graft

import org.apache.spark.sql.functions._
import graft.llm.{Pipeline, TextAnalysis}

class PipelineSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  /** Independent md5 (java.security, not Spark) for cross-checking the
    * hash-seeded sampling/split operators. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("stratifiedSample keeps exactly the k lowest-md5 ids per stratum") {
    val d = docs((0L to 19L).map(i =>
      (i, s"s${i % 2}", s"text $i")): _*)
    val got = Pipeline.stratifiedSample(d, "source", k = 3)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = (0L to 19L).groupBy(i => s"s${i % 2}").toSeq.flatMap {
      case (src, ids) =>
        ids.sortBy(i => (md5hex(i.toString), i)).take(3).map(i => (src, i))
    }.toSet
    assert(got == expected)
    assert(got.size == 6)
  }

  test("hashSplit assigns by salted md5 hex thresholds, deterministically") {
    val d = docs((0L to 99L).map(i => (i, "s", s"t$i")): _*)
    val got = Pipeline.hashSplit(d).select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    (0L to 99L).foreach { i =>
      val h = md5hex(s"graft:$i")
      val exp =
        if (h < "0d") "test" else if (h < "1a") "val" else "train"
      assert(got(i) == exp, s"doc $i hash $h")
    }
    // rerun is identical (content-independent, seedless)
    val again = Pipeline.hashSplit(d).select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(again == got)
  }

  test("packChunks: global offsets stitch strata; windows split docs") {
    // strata a: docs 1 (3 tok), 2 (5 tok); strata b: doc 3 (4 tok)
    val d = docs(
      (1L, "a", "w w w"),
      (2L, "a", "w w w w w"),
      (3L, "b", "w w w w"))
    val got = Pipeline.packChunks(d, TextAnalysis.wordCount(col("text")),
        budget = 4, strataCol = "source")
      .select("doc_id", "token_offset", "first_win", "last_win").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // stream: [doc1: 0-2][doc2: 3-7][doc3: 8-11], windows of 4
    assert(got(1L) == (0L, 0L, 0L))
    assert(got(2L) == (3L, 0L, 1L)) // spans windows 0 and 1
    assert(got(3L) == (8L, 2L, 2L))
  }

  test("packChunks: empty doc occupies its offset with no extra window") {
    val d = docs((1L, "a", "x y"), (2L, "a", " "), (3L, "a", "z"))
    val got = Pipeline.packChunks(d, TextAnalysis.wordCount(col("text")),
        budget = 10, strataCol = "source")
      .select("doc_id", "token_offset", "first_win", "last_win").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(2L) == (2L, 0L, 0L))
    assert(got(3L) == (2L, 0L, 0L)) // empty doc consumed no tokens
  }

  test("packChunks: a null stratum packs as its own group, never drops") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, null.asInstanceOf[String], "w w w"),
        (2L, "a", "w w"), (3L, null.asInstanceOf[String], "w"))
      .toDF("doc_id", "source", "text")
    val got = Pipeline.packChunks(d, TextAnalysis.wordCount(col("text")),
        budget = 10, strataCol = "source")
      .select("doc_id", "token_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // null sorts FIRST in the stratum prefix order: null-docs 1,3 then a
    assert(got == Map(1L -> 0L, 3L -> 3L, 2L -> 4L))
  }

  test("decontaminate flags docs sharing a 3-gram with the benchmark set") {
    val bench = docs((100L, "b", "alpha beta gamma delta"))
    val corpus = docs(
      (1L, "c", "alpha beta gamma something else entirely"), // shares 1
      (2L, "c", "beta gamma delta and alpha beta gamma too"), // shares 2
      (3L, "c", "no overlap with anything here at all"))
    val got = Pipeline.decontaminate(corpus, bench, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
    // the operator-internal persist AUTO-releases once the action that
    // read it completes (QueryExecutionListener) — no per-call
    // session-lifetime leak, and nothing for the caller to remember
    awaitNoTracked()
    assert(Pipeline.decontaminate(corpus, bench, n = 3).count() == 2)
    awaitNoTracked()
  }

  /** The auto-release listener fires asynchronously on the listener
    * bus — poll briefly instead of asserting instantly. The tracked
    * counter is JVM-global, so start from a clean slate: another
    * suite's plan-only inspections may have left consumer-less
    * entries that are not this test's concern. */
  private def awaitNoTracked(): Unit = {
    val deadline = System.nanoTime() + 10_000_000_000L
    while (graft.llm.OpCaches.trackedCount > 0 &&
        System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(graft.llm.OpCaches.trackedCount == 0,
      s"${graft.llm.OpCaches.trackedCount} tracked entries never released")
  }

  graft.llm.OpCaches.release() // clean slate before this suite's tests

  test("OpCaches auto-release covers an end-to-end decontaminate + " +
      "fuzzy + idf pipeline: zero tracked entries after the consumers " +
      "materialize, with no explicit release call") {
    val bench = docs((100L, "b", "alpha beta gamma delta epsilon zeta"))
    val corpus = docs(
      (1L, "c", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "c", "completely different text with no overlap at all"),
      (3L, "c", "alpha beta gamma delta epsilon zeta but edited"))
    assert(Pipeline.decontaminate(corpus, bench, n = 3).count() >= 1)
    assert(Pipeline.fuzzyDecontaminate(corpus, bench, n = 3,
      threshold = 0.2).count() >= 1)
    assert(graft.llm.TextAnalysis.docFrequency(corpus).count() > 0)
    awaitNoTracked()
  }

  test("decontaminate: exact copies collapse but every member is flagged " +
      "with the group's verdict") {
    val bench = docs((100L, "b", "alpha beta gamma delta"))
    val corpus = docs(
      (1L, "c", "alpha beta gamma something else entirely"),
      (11L, "c", "alpha beta gamma something else entirely"), // copy of 1
      (2L, "c", "beta gamma delta and alpha beta gamma too"),
      (21L, "c", "beta gamma delta and alpha beta gamma too"), // copy of 2
      (3L, "c", "no overlap with anything here at all"))
    val got = Pipeline.decontaminate(corpus, bench, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 11L -> 1L, 2L -> 2L, 21L -> 2L))
  }

  test("fuzzyDecontaminate: exact copies expand to identical " +
      "(bench_id, jaccard) verdicts per member") {
    val bench = docs(
      (100L, "b", "alpha beta gamma delta epsilon zeta eta theta"))
    val corpus = docs(
      (1L, "c", "alpha beta gamma delta epsilon zeta eta changed"),
      (11L, "c", "alpha beta gamma delta epsilon zeta eta changed"),
      (12L, "c", "alpha beta gamma delta epsilon zeta eta changed"),
      (3L, "c", "no overlap with anything here at all"))
    val got = Pipeline.fuzzyDecontaminate(corpus, bench, n = 3,
        numHashes = 64, bands = 32, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.keySet == Set(1L -> 100L, 11L -> 100L, 12L -> 100L))
    assert(got.values.toSet.size == 1)
    assert(math.abs(got((1L, 100L)) - 5.0 / 7.0) < 1e-12)
  }

  test("fuzzyDecontaminate: LSH cross-corpus candidates match brute-force " +
      "jaccard; bench side broadcasts, corpus never sort-merges") {
    val bench = docs(
      (100L, "b", "alpha beta gamma delta epsilon zeta eta theta"))
    val corpus = docs(
      (1L, "c", "alpha beta gamma delta epsilon zeta eta changed"), // j=5/7
      (2L, "c", "alpha beta gamma completely different words here"), // j=1/10
      (3L, "c", "no overlap with anything here at all"))
    val out = Pipeline.fuzzyDecontaminate(corpus, bench, n = 3,
      numHashes = 64, bands = 32, threshold = 0.4)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L -> 100L)))
    assert(math.abs(got((1L, 100L)) - 5.0 / 7.0) < 1e-12)
    // scale contract: bench bands + shingle arrays ride as broadcasts
    // and the corpus side never sort-merges (it must not shuffle)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"corpus side must not sort-merge:\n$plan")
  }

  test("chunkDocs: overlapping windows cover the tail; short docs pass " +
      "whole; empty docs drop") {
    val d = docs(
      (1L, "c", (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "c", "a b c"),                                  // shorter than size
      (3L, "c", "   "))                                    // no tokens
    val got = Pipeline.chunkDocs(d, size = 8, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    assert(got == Set(
      (1L, 0L, 0L, 8L, (1 to 8).map(i => s"w$i").mkString(" ")),
      (1L, 1L, 4L, 6L, (5 to 10).map(i => s"w$i").mkString(" ")),
      (1L, 2L, 8L, 2L, "w9 w10"),
      (2L, 0L, 0L, 3L, "a b c")))
    // stride == size -> disjoint windows
    assert(Pipeline.chunkDocs(d, size = 5, stride = 5).count() == 3L)
  }

  test("semanticDecontaminate: exact arm flags by max bench cosine; " +
      "pruned arm matches exact on separated clusters") {
    val s = spark
    import s.implicits._
    val bench = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0)),
      (101L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.9, 0.1, 0.0, 0.0)), // cos to b100 = .9/.90554 ≈ .99388
      (2L, Seq(0.0, 0.0, 1.0, 0.0)), // orthogonal to both -> dropped
      (3L, Seq(0.0, 1.0, 0.0, 0.0))) // identical to b101
      .toDF("vec_id", "embedding")
    val exact = Pipeline.semanticDecontaminate(corpus, bench, threshold = 0.8)
    val got = exact.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(math.abs(got(1L)._1 - 0.9 / math.sqrt(0.82)) < 1e-12)
    assert(got(1L)._2 == 1L && got(3L) == ((1.0, 1L)))
    // exact arm: bench broadcasts (nested-loop), nothing sort-merges
    val plan = exact.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // pruned arm on well-separated bench clusters reproduces the
    // exact arm (each corpus vector's best bench lives in its top cell)
    val pruned = Pipeline.semanticDecontaminate(corpus, bench,
      threshold = 0.8, nlist = 2, nprobe = 1)
    assert(pruned.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet ==
      exact.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet)
  }

  test("piiSignals counts and scrubs emails, ips, phones") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "mail me at a.b+c@ex-ample.org or b@x.io, host 10.0.0.1, tel 555-123-4567"),
      (2L, "clean text without identifiers")).toDF("doc_id", "text")
    val got = TextAnalysis.piiSignals(d)
      .select("doc_id", "n_emails", "n_ipv4", "n_phones", "scrubbed")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L)._1 == 2L)
    assert(got(1L)._2 == 1L)
    assert(got(1L)._3 == 1L)
    assert(got(1L)._4 ==
      "mail me at <EMAIL> or <EMAIL>, host <IP>, tel <PHONE>")
    assert(got(2L) == ((0L, 0L, 0L, "clean text without identifiers")))
  }

  test("qualityFilter sets the right reason bits") {
    val longWords = (1 to 50).map(i => s"word$i").mkString(" ")
    val stopRich = (1 to 25).map(_ => "the table").mkString(" ") // 50 words
    val repetitive = (1 to 25).map(_ => "dup gram").mkString(" ")
    val d = docs(
      (1L, "s", "short text only"), // bit 1 (short) + bit 2 (no stopwords)
      (2L, "s", longWords), // no stopwords -> bit 2
      (3L, "s", stopRich)) // stopword-rich but "the table" repeats -> bit 16
    val got = TextAnalysis.qualityFilter(d)
      .select("doc_id", "keep", "reasons").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._2 == (1L | 2L | 16L))
    assert(got(2L) == ((0L, 2L)))
    assert((got(3L)._2 & 16L) == 16L)
    assert(got.values.forall { case (k, r) => (k == 1L) == (r == 0L) })
    val _ = repetitive
  }

  test("mixtureSample keeps by per-group hex threshold; unlisted groups drop") {
    val d = docs((0L to 99L).map(i => (i, s"s${i % 4}", s"t$i")): _*)
    val got = Pipeline.mixtureSample(d,
        Seq("s0" -> "g", "s1" -> "80", "s2" -> "40"), "source")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (0L to 99L).flatMap { i =>
      val src = s"s${i % 4}"
      val thr = Map("s0" -> "g", "s1" -> "80", "s2" -> "40").get(src)
      val h = md5hex(s"mix:$i")
      thr.collect { case t if h < t => (i, src) }
    }.toSet
    assert(got == expected)
    assert(got.count(_._2 == "s0") == 25) // "g" keeps the whole group
    assert(!got.exists(_._2 == "s3"))     // unlisted group drops
  }

  test("segmentDedup keeps first occurrence and reassembles survivors") {
    val s = spark
    import s.implicits._
    // 2-word segments: doc1 = [a b][c d], doc2 = [c d][e f], doc3 = [a b]
    val d = Seq(
      (1L, "a b c d"), (2L, "c d e f"), (3L, "a b")).toDF("doc_id", "text")
    val got = graft.llm.Dedup.segmentDedup(d, segWords = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    def m(x: String) = md5hex(x)
    // doc1 keeps both; doc2 loses "c d" (doc1 owns it), keeps "e f";
    // doc3 loses "a b" entirely -> absent from output
    assert(got(1L) == ((2L, m("a b c d"))))
    assert(got(2L) == ((1L, m("e f"))))
    assert(!got.contains(3L))
  }

  test("segmentDedup dedups repeats within one doc, keeps min position") {
    val s = spark
    import s.implicits._
    val d = Seq((5L, "x y x y z z")).toDF("doc_id", "text")
    val got = graft.llm.Dedup.segmentDedup(d, segWords = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    // segments: [x y][x y][z z] -> keep idx1 "x y" and idx3 "z z"
    assert(got(5L) == ((2L, md5hex("x y z z"))))
  }

  test("incrementalDedup drops batch docs whose content exists in corpus") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "Alpha  Beta"), (2L, "gamma")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta"),   // normalized dup of corpus 1 -> dropped
      (11L, "delta epsilon") // new -> kept
    ).toDF("doc_id", "text")
    val got = graft.llm.Dedup.incrementalDedup(corpus, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L))
  }

  test("incrementalDedupBloom: subset of exact-new, no false negatives") {
    val s = spark
    import s.implicits._
    val corpus = (0L to 49L).map(i => (i, s"corpus doc $i")).toDF("doc_id", "text")
    val batch = ((100L to 129L).map(i => (i, s"new doc $i")) ++
      (0L to 9L).map(i => (i + 200L, s"corpus doc $i"))) // 10 known dups
      .toDF("doc_id", "text")
    val exact = graft.llm.Dedup.incrementalDedup(corpus, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = graft.llm.Dedup.incrementalDedupBloom(corpus, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact == (100L to 129L).toSet)
    assert(bloom.subsetOf(exact)) // FPs only ever DROP new docs
    assert((exact -- bloom).size <= 2) // 1% fpp on 30 docs
  }

  test("urlDedup collapses scheme/case/query/slash variants of a page") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "a b https://WWW.Example.com/p/3/?utm=x#top"),
      (2L, "c d http://example.com/p/3/"),
      (3L, "no url here"),
      (4L, "e https://other.com/q")).toDF("doc_id", "text")
    val got = TextAnalysis.urlDedup(d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "example.com/p/3" -> ((2L, 1L)),
      "other.com/q" -> ((1L, 4L))))
  }

  test("termStats ranks by freq desc then term, with cumulative share") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "b a b c a b")).toDF("doc_id", "text")
    val got = TextAnalysis.termStats(d, topK = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getFloat(3), r.getFloat(4)))
    assert(got.toSeq == Seq(
      (1, "b", 3L, 0.5f, 0.5f),
      (2, "a", 2L, (2.0 / 6.0).toFloat, (5.0 / 6.0).toFloat)))
  }
}
