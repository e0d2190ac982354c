package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity, TextAnalysis}

class LlmSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups normalized duplicates") {
    val d = docs(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text"))
    val got = Dedup.exact(d).orderBy("canonical_id")
      .select("canonical_id", "dup_count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds the near-duplicate pair brute-force finds") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val d = docs(
      (1L, base),
      (2L, base + " tomorrow"), // near dup of 1
      (3L, "completely different content about spark catalyst expression trees"))
    val lsh = Dedup.minhashLsh(d, n = 2, numHashes = 64, bands = 32, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.ngramJaccardAllPairs(d, n = 2, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute == Set((1L, 2L)))
    assert(lsh == brute)
  }

  test("lsh ANN: near-identical vector is found as top candidate") {
    val s = spark
    import s.implicits._
    val base = Seq(1.0, 0.2, -0.5, 0.8)
    val em = (Seq(
      (1L, base),
      (2L, base.map(_ * 1.01)), // same direction -> same LSH signs
      (3L, base.map(-_))) ++
      (4L to 20L).map(i => (i, Seq(math.cos(i * 1.0), math.sin(i * 2.0),
        math.cos(i * 3.0), math.sin(i * 0.5)))))
      .toDF("vec_id", "embedding")
    val got = Similarity.lshTopK(em, em.filter($"vec_id" === 1), k = 3,
        bitsPerTable = 8, tables = 16)
      .orderBy("rank").collect()
    assert(got.head.getLong(1) == 2L) // rank 1 = the near-duplicate
    assert(got.head.getDouble(2) > 0.999)
  }

  test("embedding near-dup LSH default path finds synthetic near-identicals") {
    val s = spark
    import s.implicits._
    val dim = 16
    def vec(seed: Int): Seq[Double] =
      (0 until dim).map(d => math.sin(seed * 7.3 + d * 1.7))
    // 3 near-dup pairs (tiny perturbation, cosine > 0.99) + 40 unrelated
    val em = ((0 until 3).flatMap { p =>
      val v = vec(p)
      Seq((p * 2L, v), (p * 2L + 1, v.map(_ * 1.001).updated(0, v.head + 0.003)))
    } ++ (100L until 140L).map(i => (i, vec(i.toInt)))).toDF("vec_id", "embedding")
    val lsh = Dedup.embeddingNearDup(em, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embeddingNearDupExact(em, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact) // recall ≈0.992 per pair at b=16/L=24; 3 pairs
  }

  test("brute-force paths refuse oversized inputs (O(n²) guard)") {
    val s = spark
    import s.implicits._
    val big = (0L until 50L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardAllPairs(big, maxRows = 10).count()
    }
    val bigEm = (0L until 50L).map(i => (i, Seq(i.toDouble, 1.0)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Dedup.embeddingNearDupExact(bigEm, threshold = 0.9, maxRows = 10).count()
    }
  }

  test("simhash: identical docs distance 0, near dups within small radius") {
    val base = "one two three four five six seven eight nine ten"
    val d = docs((1L, base), (2L, base), (3L, base + " eleven"))
    val pairs = Dedup.simhashPairs(d, radius = 8)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 8)
  }

  test("fingerprintSql: winnowing minima and edge cases (hand-computed)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = docs(
      (1L, "a b"),                   // <3 words -> content hash
      (2L, "a b c d e f"),           // 4 k-grams -> exactly 1 window
      (3L, "One  two THREE four five six seven eight")) // 6 k-grams, 3 windows
    val got = TextAnalysis.fingerprintSql(d)
      .select("doc_id", "content_hash", "winnow_fp").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got(1L) == ((md5hex("a b"), md5hex("a b"))))
    val k2 = Seq("a b c", "b c d", "c d e", "d e f").map(md5hex)
    assert(got(2L)._2 == k2.min)
    val w3 = "one two three four five six seven eight".split(" ").toSeq
    val k3 = w3.sliding(3).map(_.mkString(" ")).map(md5hex).toSeq
    val mins = k3.sliding(4).map(_.min).toSeq
    assert(got(3L)._1 == md5hex(w3.mkString(" ")))
    assert(got(3L)._2 == mins.distinct.sorted.mkString(","))
  }

  test("cosine of orthogonal and identical vectors") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)), (3L, Array(2.0, 0.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 1), k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), math.rint(r.getDouble(2) * 1e9) / 1e9)).toSeq
    assert(got == Seq((3L, 1.0), (2L, 0.0)))
  }

  test("IVF recall: top-1 matches brute force on clustered data") {
    val s = spark
    import s.implicits._
    // two clear clusters around (1,0) and (0,1)
    val vecs = (0 until 20).map { i =>
      val c = i % 2
      val eps = (i / 2) * 0.01
      (i.toLong, if (c == 0) Array(1.0, eps) else Array(eps, 1.0))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 2)
    def top1(r: org.apache.spark.sql.DataFrame) =
      r.filter(col("rank") === 1).select("query_id", "corpus_id")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val bf = top1(Similarity.bruteForceTopK(df, q, 1))
    val ivf = top1(Similarity.ivfTopK(df, q, 1, nlist = 4, nprobe = 2))
    assert(bf == ivf)
  }

  test("word count and quality signals") {
    val d = docs((1L, "the quick brown fox"), (2L, ""), (3L, "  a  b  "))
    val got = d.select(col("doc_id"), TextAnalysis.wordCount(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 4, 2L -> 0, 3L -> 2))
    val q = TextAnalysis.qualitySignals(docs((1L, "the of and to in is!!")))
      .select("stopword_ratio").collect()(0).getDouble(0)
    assert(q > 0.8) // all-stopword text
  }

  test("linear quality scorer: md5-bucket weights, sigmoid of the " +
      "token mean; empty text is the 0.5 prior") {
    val d = docs((1L, "hello"), (2L, "hello world"), (3L, ""),
      (4L, "  hello  "))
    val got = TextAnalysis.linearQualityScore(d)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // hand-derived: md5("hello")=5d41... -> bucket 93 -> w=-0.64356...
    assert(math.abs(got(1L) - 0.3444412567945848) < 1e-12)
    assert(math.abs(got(2L) - 0.51979163372766) < 1e-12)
    assert(got(3L) === 0.5) // no tokens -> sigmoid(0)
    assert(got(4L) === got(1L)) // whitespace-insensitive tokenization
  }

  test("trained-weights door: a parquet weights artifact drives the " +
      "scorer byte-for-byte, its bucketing matches the scorer's md5 " +
      "hashing trick, and broken artifacts refuse to load") {
    val d = docs((1L, "hello"), (2L, "hello world"), (3L, ""))
    val arithmetic = TextAnalysis.linearQualityScore(d)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // round-trip the pseudo-model through the artifact door: identical
    // scores, exactly (same doubles, same fold)
    val path = java.nio.file.Files
      .createTempDirectory("graft-qf2w").toString + "/w"
    TextAnalysis.writeBucketWeights(spark, path,
      TextAnalysis.pseudoBucketWeights)
    val loaded = TextAnalysis.loadBucketWeights(spark, path)
    assert(loaded.sameElements(TextAnalysis.pseudoBucketWeights))
    val viaFile = TextAnalysis.linearQualityScore(d, weights = Some(loaded))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaFile === arithmetic)
    // bucketing agreement: an indicator vector at the SCALA-computed
    // md5 bucket of "hello" must score sigmoid(1) for a one-word doc —
    // pins that artifact indexing and the scorer's md5Bucket agree
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val bucket = Integer.parseInt(md5hex.take(2), 16)
    val indicator = Array.tabulate(256)(i => if (i == bucket) 1.0 else 0.0)
    val one = TextAnalysis.linearQualityScore(docs((9L, "hello")),
        weights = Some(indicator))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(one(9L) - 1.0 / (1.0 + math.exp(-1.0))) < 1e-12)
    // a sparse artifact (bucket missing) is a broken export: refuse
    val s = spark
    import s.implicits._
    val sparsePath = java.nio.file.Files
      .createTempDirectory("graft-qf2w").toString + "/sparse"
    (0 until 255).map(b => (b, 0.0)).toDF("bucket", "weight")
      .write.parquet(sparsePath)
    intercept[IllegalArgumentException](
      TextAnalysis.loadBucketWeights(spark, sparsePath))
    intercept[IllegalArgumentException](
      TextAnalysis.linearQualityScore(d, weights = Some(Array(1.0))))
  }

  test("language scores favor matching marker set") {
    val d = docs((1L, "the cat and the dog of the house"),
      (2L, "el gato y la casa por la noche"))
    val got = TextAnalysis.languageId(d).select("doc_id", "lang_pred")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
  }

  test("language ID detects unsegmented Chinese (character markers, " +
      "not whitespace tokens)") {
    val d = docs((1L, "\u6211\u662f\u5b66\u751f\u4ed6\u4eec\u7684\u4e66"),
      (2L, "the cat sat"))
    val got = TextAnalysis.languageId(d).select("doc_id", "lang_pred")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "zh")
    assert(got(2L) == "en")
  }

  test("urlDedup extracts uppercase-scheme URLs too") {
    val d = docs((1L, "see HTTP://Example.com/p/1 there"),
      (2L, "see http://example.com/p/1 also"))
    val got = TextAnalysis.urlDedup(d).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_docs") == 2L)
  }

  private def components(edges: (Long, Long)*): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connected components: chain, star, isolated pair, self-loop") {
    // 9←8←7←6←5 chain (worst case for naive propagation), star at 1,
    // isolated pair (20,21), self-loop (30,30) dropped entirely
    val got = components((5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L),
      (1L, 2L), (1L, 3L), (1L, 4L), (20L, 21L), (30L, 30L))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 5L,
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components match union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical = min of component: min over members sharing a root
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val minOfRoot = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
    val want = nodes.map(n => n -> minOfRoot(find(n))).toMap
    assert(components(edges: _*) == want)
  }

  test("duplicateClusters sizes over known pairs") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 10L -> 2L))
  }

  test("fuzzyClusters == duplicateClusters(minhashLsh) on a copy-heavy corpus") {
    // exact-copy groups (the star-edge path), near-dup cross pairs
    // between DIFFERENT copy groups (the rep-pair path), a shingle-less
    // copy group (2 words < n=3: must stay UNclustered in both forms),
    // and singletons. Differential: the linear star-edge formulation
    // must produce the exact (canonical, size) rows of the expanded
    // member-level pair formulation.
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy dog again and often"
    val other = "completely unrelated text about spark catalyst optimizers"
    val d = docs(
      (1L, base), (2L, base), (3L, base),          // copy group {1,2,3}
      (10L, near), (11L, near),                    // copy group {10,11}, near-dup of base
      (20L, other), (21L, other),                  // isolated copy group
      (30L, "hi there"), (31L, "hi there"),        // shingle-less copies: no cluster
      (40L, "a lone document mentioning nothing similar to the others at all"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expanded = rows(Dedup.duplicateClusters(
      Dedup.minhashLsh(d, n = 3, numHashes = 64, bands = 16, threshold = 0.4)))
    val fused = rows(Dedup.fuzzyClusters(
      d, n = 3, numHashes = 64, bands = 16, threshold = 0.4))
    assert(fused == expanded)
    // sanity on the shape itself, not just agreement: {1,2,3,10,11}
    // merge through the cross pair; {20,21} isolated; {30,31} absent
    assert(fused == Set((1L, 5L), (20L, 2L)))
  }

  test("repetition signals: dup-line and top-2-gram fractions") {
    val d = docs(
      (1L, "spam line\nspam line\nspam line\nreal content here"),
      (2L, "a b a b a b"), // 2-grams: "a b"×3, "b a"×2 → top 3/5
      (3L, "all distinct words here"),
      (4L, ""))
    val got = TextAnalysis.repetitionSignals(d)
      .select("doc_id", "dup_line_frac", "top_2gram_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 0.5) // 4 lines, 2 are copies of the first
    assert(math.abs(got(2L)._2 - 0.6) < 1e-9)
    assert(got(3L) == (0.0, 1.0 / 3.0))
    assert(got(4L) == (0.0, 0.0))
  }

  test("kmeansCentroids seeding survives a zero-norm vector") {
    val s = spark
    import s.implicits._
    // cos(zero, anything) is NaN, so maxc for the zero row never moves
    // off the -2.0 sentinel; without explicit picked-tracking the same
    // index would seed every remaining cell. The zero vector has the
    // lowest xxhash-ordered position guard removed by using distinct
    // directions, so all we pin is: nlist distinct seeds come back.
    val vecs = Seq(
      (1L, Seq(0.0, 0.0, 0.0)), // zero-norm poison row
      (2L, Seq(1.0, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0)))
    val em = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(em, nlist = 3, iters = 0)
      .collect().map(_.getSeq[Double](1))
    assert(cents.length == 3)
    // at most one seed may be the zero vector — the old bug made every
    // post-poison seed a copy of whatever index got stuck
    assert(cents.distinct.length == 3, s"duplicate seeds: ${cents.toSeq}")
    // nlist > sample size still terminates (duplicates the head)
    val over = Similarity.kmeansCentroids(em, nlist = 6, iters = 0)
      .collect()
    assert(over.length == 6)
  }

  test("kmeansAssign recovers well-separated clusters") {
    val s = spark
    import s.implicits._
    // 3 orthogonal directions, 8 noisy members each
    val base = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0))
    val vecs = for (g <- 0 until 3; i <- 0 until 8) yield
      ((g * 8 + i).toLong,
        base(g).zipWithIndex.map { case (v, d) =>
          v + 0.05 * math.sin((g * 8 + i) * 3.1 + d) })
    val em = vecs.toDF("vec_id", "embedding")
    val rows = Similarity.kmeansAssign(em, nlist = 3, iters = 5).collect()
    val got = rows.map(r => (r.getLong(0), r.getInt(1)))
    val byGroup = got.groupBy(_._1 / 8).view.mapValues(_.map(_._2).toSet).toMap
    // every synthetic group lands in exactly one cell, all distinct
    assert(byGroup.values.forall(_.size == 1), s"split groups: $byGroup")
    assert(byGroup.values.flatten.toSet.size == 3, s"merged groups: $byGroup")
    // assigned cosine is high for every member
    assert(rows.map(_.getDouble(2)).min > 0.99)
  }

  test("semDedup drops near-identical cluster-mates, keeps distinct vectors") {
    val s = spark
    import s.implicits._
    // two orthogonal directions; ids 10/11 are near-copies of id 1,
    // id 21 a near-copy of id 20; ids 2 and 22 distinct members
    def jig(v: Seq[Double], k: Long): Seq[Double] =
      v.zipWithIndex.map { case (x, d) => x + 1e-4 * math.sin(k * 2.7 + d) }
    val a = Seq(1.0, 0.0, 0.0, 0.0); val b = Seq(0.0, 1.0, 0.0, 0.0)
    val em = Seq(
      1L -> jig(a, 1), 10L -> jig(a, 10), 11L -> jig(a, 11),
      2L -> Seq(0.7, 0.0, 0.7, 0.0), // same hemisphere, below τ
      20L -> jig(b, 20), 21L -> jig(b, 21),
      22L -> Seq(0.0, 0.7, 0.0, 0.7))
      .toDF("vec_id", "embedding")
    val got = Dedup.semDedup(em, nClusters = 2, threshold = 0.99, iters = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(r.fieldIndex("dropped")),
          if (r.isNullAt(r.fieldIndex("witness_id"))) -1L
          else r.getLong(r.fieldIndex("witness_id")))).toMap
    assert(got(1L) == (false, -1L))   // lowest id in its dup group survives
    assert(got(10L) == (true, 1L))    // witness = best lower-id match
    assert(got(11L)._1)
    assert(got(2L) == (false, -1L))   // below threshold -> kept
    assert(got(20L) == (false, -1L))
    assert(got(21L) == (true, 20L))
    assert(got(22L) == (false, -1L))
  }

  test("repeatedSpans counts positions covered by cross-doc grams") {
    val shared = "alpha beta gamma delta epsilon" // one 5-gram
    val d = docs(
      (1L, shared + " zeta eta"),          // 3 grams, 1 duplicated
      (2L, "intro words " + shared),       // 3 grams, 1 duplicated
      (3L, shared + " " + shared),         // 6 grams: positions 1 and 6
      (4L, "totally different text with no overlap here"),
      (5L, "shorty"))                      // < 5 words -> no grams row
    val got = Dedup.repeatedSpans(d, w = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (3L, 1L))
    assert(got(2L) == (3L, 1L))
    // doc 3: 6 grams; the shared gram occurs at positions 1 and 6
    assert(got(3L) == (6L, 2L))
    assert(got(4L) == (3L, 0L)) // 7 words -> 3 positional 5-grams
    assert(!got.contains(5L))
  }

  test("text-dedup/LM planes compile sort-free: no Sort/Window over the " +
      "(gram,doc) or bigram sets") {
    // These five resurfaced from count().over(Window.partitionBy(...))
    // to hash aggregates + shuffled-hash joins — a Sort or Window node
    // reappearing is the 100TB-scale regression this test pins against.
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon other words here"),
      (3L, "unrelated text about catalyst expression trees"))
    val plans = Seq(
      "dd7" -> Dedup.repeatedSpans(d),
      "es1" -> Dedup.removeRepeatedSpans(d),
      "dd8" -> Dedup.fingerprintDup(d),
      "dd2" -> Dedup.minhashLsh(d, n = 2, numHashes = 8, bands = 4),
      "lm1" -> TextAnalysis.perplexity(d))
    for ((name, df) <- plans) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("SortExec") && !" Sort ".r.findFirstIn(p).isDefined,
        s"$name plan contains a Sort node:\n$p")
      assert(!p.contains("Window"), s"$name plan contains a Window node:\n$p")
    }
    // plan inspection runs NO action, so operator-internal OpCaches
    // persists have no consumer to auto-release them — clean up
    // explicitly or they pollute the global tracked count for every
    // later suite in the JVM
    graft.llm.OpCaches.release()
  }

  test("fingerprintDup: exact copies bypass the candidate join; over-cap " +
      "buckets of DISTINCT content are dropped") {
    // (a) 6 IDENTICAL docs collapse to one representative — their 15
    // pairs come from the linear collapse/expand path, so even a cap
    // of 1 cannot drop them and no quadratic join ever runs.
    val boiler = "the quick brown fox jumps over the lazy dog again and " +
      "again while the cat sleeps soundly near the warm stone fireplace"
    val same = docs((1 to 6).map(i => (i.toLong, boiler)): _*)
    val exact = Dedup.fingerprintDup(same, maxBucket = 1)
    assert(exact.count() == 15L)
    // every expanded pair carries the full fingerprint count
    assert(exact.select("shared").distinct().collect().length == 1)
    // (b) 6 DISTINCT docs sharing a long boilerplate core: the shared
    // interior fingerprints form 6-rep buckets, dropped at maxBucket=3
    // (each doc's unique-tail fingerprints are singletons) → no pairs;
    // a loose cap keeps the shared bucket → all 15 pairs.
    val distinctDocs = docs((1 to 6).map(i =>
      (i.toLong, boiler + s" unique tail $i with entirely different " +
        s"closing words number$i variant$i ending$i")): _*)
    assert(Dedup.fingerprintDup(distinctDocs, maxBucket = 3).count() == 0L)
    assert(Dedup.fingerprintDup(distinctDocs, maxBucket = 100).count() == 15L)
  }

  test("minhashLsh: collapse/expand equals the brute-force pair oracle on " +
      "a corpus with exact copies") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "spark catalyst expression trees compile to java bytecode at runtime"
    val d = docs(
      (1L, a), (2L, a), // exact copies
      (3L, a + " tomorrow"), // near dup of 1/2
      (4L, b), (5L, "  " + b.toUpperCase + "  "), // copies modulo normalization
      (6L, "completely unrelated text about distributed shuffle services"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6)
    val lsh = Dedup.minhashLsh(d, n = 2, numHashes = 64, bands = 32,
      threshold = 0.3).collect().map(key).toSet
    val brute = Dedup.ngramJaccardAllPairs(d, n = 2, threshold = 0.3)
      .collect().map(key).toSet
    assert(lsh == brute)
    assert(lsh.contains((1L, 2L, 1.0)) && lsh.contains((4L, 5L, 1.0)))
  }

  test("PQ: decode fidelity and exact top-1 recovery on clustered data") {
    val s = spark
    import s.implicits._
    val dim = 16
    // 4 well-separated directions, 12 jittered members each
    def base(g: Int): Seq[Double] =
      (0 until dim).map(d => if (d / 4 == g) 1.0 else 0.0)
    val vecs = for (g <- 0 until 4; i <- 0 until 12) yield
      ((g * 12 + i).toLong,
        base(g).zipWithIndex.map { case (v, d) =>
          v + 0.02 * math.sin((g * 12 + i) * 1.9 + d) })
    val em = vecs.toDF("vec_id", "embedding")
    val books = llm.Pq.train(em, m = 4, k = 8, iters = 10, sampleN = 64)
    assert(books.length == 4 && books.forall(_.forall(_.length == 4)))
    // reconstruction keeps high cosine to the original
    val enc = llm.Pq.encode(em, books)
    val fid = enc.withColumn("dec", llm.Pq.decodeCol(col("pq_code"), books))
      .withColumn("c", Similarity.cosine(col("embedding"), col("dec")))
      .agg(min("c")).head.getDouble(0)
    assert(fid > 0.95, s"reconstruction cosine $fid")
    // ADC + re-rank finds each query's true nearest neighbor
    // shortlist must cover a quantization cell: members of one tight
    // cluster can share a single code (tied ADC scores), so a
    // shortlist smaller than the cell may exclude the true NN
    val got = llm.Pq.adcTopK(em, em.filter($"vec_id".isin(0L, 12L, 24L)),
      books, k = 1, shortlist = 12)
    val exact = Similarity.bruteForceTopK(em,
      em.filter($"vec_id".isin(0L, 12L, 24L)), k = 1)
    val g1 = got.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e1 = exact.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g1 == e1)
    // IVF-PQ: cell pruning + ADC + re-rank still finds each true NN
    // (4 well-separated clusters -> probing 2 of 4 cells covers the
    // query's own cluster)
    val ivf = llm.Pq.ivfAdcTopK(em, em.filter($"vec_id".isin(0L, 12L, 24L)),
      books, k = 1, nlist = 4, nprobe = 2, shortlist = 12)
    val gi = ivf.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gi == e1)
    // the candidate stage hands the exact re-rank AT MOST
    // |queries|·shortlist rows — the constant-volume contract
    // inv_sim4_rerank_ratio polices at 32x (a corpus-proportional
    // shortlist is an O(N) exact pass wearing a PQ costume)
    val sl = llm.Pq.ivfShortlist(em, em.filter($"vec_id".isin(0L, 12L, 24L)),
      books, nlist = 4, nprobe = 2, shortlist = 5)
    assert(sl.count() <= 3 * 5)
    val perQ = sl.groupBy("query_id").count()
      .agg(max("count")).head.getLong(0)
    assert(perQ <= 5, s"per-query shortlist $perQ > 5")
    // persisted index: codebooks round-trip bit-exactly and the probe
    // over the on-disk codes finds the same true NNs as the in-memory
    // path (same centroids, codebooks, shortlist discipline)
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivfpq").toString
    llm.Pq.writeIvfPqIndex(em, root, books, nlist = 4)
    val booksBack = llm.Pq.readCodebooks(s, root)
    assert(booksBack.length == books.length)
    for (sp <- books.indices) {
      assert(booksBack(sp).length == books(sp).length, s"subspace $sp")
      for (c <- books(sp).indices)
        assert(java.util.Arrays.equals(booksBack(sp)(c), books(sp)(c)),
          s"codebook ($sp,$c) did not round-trip")
    }
    val probed = llm.Pq.probeIvfPqIndex(s, root, em,
      em.filter($"vec_id".isin(0L, 12L, 24L)), k = 1, nprobe = 2,
      shortlist = 12)
    val gp = probed.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gp == e1)
  }

  test("docFrequency counts each token once per document") {
    val d = docs(
      (1L, "spark spark catalyst"),
      (2L, "spark tungsten"),
      (3L, "catalyst"))
    val got = TextAnalysis.docFrequency(d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set("spark", "catalyst", "tungsten"))
    assert(got("spark")._1 == 2L)    // once per doc despite repetition
    assert(got("catalyst")._1 == 2L)
    assert(got("tungsten")._1 == 1L)
    assert(math.abs(got("tungsten")._2 - math.log(3.0)) < 1e-12)
    assert(math.abs(got("spark")._2 - math.log(1.5)) < 1e-12)
  }

  test("empty/whitespace-only docs are invisible to docFrequency and " +
      "the perplexity vocabulary (split('') phantom token)") {
    val d = docs(
      (1L, "spark catalyst"),
      (2L, "spark"),
      (3L, ""),       // split -> [""], must NOT count into n_docs
      (4L, "   \n "))
    val got = TextAnalysis.docFrequency(d)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set("spark", "catalyst")) // no "" token
    assert(math.abs(got("spark") - math.log(1.0)) < 1e-12) // n_docs = 2
    // perplexity vocab: "a b" + empty doc → V = 2, not 3
    val p = TextAnalysis.perplexity(docs((1L, "a b a b"), (2L, "")))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ppl")).toMap
    // bigrams of doc1: ab, ba, ab; V=2, alpha=0.5:
    // P(b|a)=(2+0.5)/(2+1), P(a|b)=(1+0.5)/(1+1)
    val expected = math.exp(
      -(2 * math.log(2.5 / 3) + math.log(0.75)) / 3)
    assert(math.abs(p(1L) - expected) < 1e-9)
  }

  test("chunkDocs preserves casing (whitespace-normalized only) and " +
      "fuzzyDecontaminate survives shingle-less pairs under ANSI") {
    val s = spark
    import s.implicits._
    val chunk = graft.llm.Pipeline.chunkDocs(
      docs((1L, "The  CEO said\n\"Hello\"")), size = 2, stride = 2)
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk_text"))
    assert(chunk.toSeq == Seq("The CEO", "said \"Hello\""))
    // two shingle-less (sub-n-gram) docs band together via the
    // degenerate all-MaxValue signature; the 0/0 jaccard must be a
    // NULL that fails the threshold, not an ANSI DIVIDE_BY_ZERO abort
    val hits = graft.llm.Pipeline.fuzzyDecontaminate(
      docs((1L, "hi"), (2L, "the quick brown fox jumps over the lazy dog " * 2)),
      docs((9L, "yo")), threshold = 0.5)
    assert(hits.collect().isEmpty)
  }

  test("removeRepeatedSpans: cross-doc 5-gram spans cut, survivors rejoin") {
    // docs 1+2 share "one two three four five" (positions 2..6 in doc1,
    // 0..4 in doc2); doc3 shares nothing
    val d = docs(
      (1L, "aa bb one two three four five cc"),
      (2L, "one two three four five dd"),
      (3L, "totally unrelated text here"))
    val got = Dedup.removeRepeatedSpans(d, w = 5).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3))).toSeq
    assert(got == Seq(
      (1L, "aa bb cc", 3, 5),
      (2L, "dd", 1, 5),
      (3L, "totally unrelated text here", 4, 0)))
    // overlapping spans merge: doc4/doc5 share 6 words -> two
    // overlapping 5-grams, all 6 words cut exactly once
    val d2 = docs(
      (4L, "x one two three four five six y"),
      (5L, "one two three four five six"))
    val got2 = Dedup.removeRepeatedSpans(d2, w = 5).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSeq
    assert(got2 == Seq((4L, "x y", 6), (5L, "", 6)))
  }

  test("weighted collapse: exact copies count as full documents in span " +
      "dedup and LM corpus statistics") {
    // The sf* gate corpora carry NO exact copies (500/500 distinct
    // normalized texts), so the oracle gate runs the collapse paths
    // with every group size = 1 and never exercises the weighting.
    // Pinned here: a 5-gram appearing ONLY inside a 3-copy group must
    // count 3 documents (duplicated), not 1 representative (kept).
    val copy = "alpha beta gamma delta epsilon zeta" // 6 words, 2 5-grams
    val solo = "one two three four five six seven"   // shares nothing
    val d = docs((1L, copy), (2L, copy), (3L, copy), (4L, solo))

    // dd7: every member of the copy group scores both grams duplicated
    val spans = Dedup.repeatedSpans(d, w = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (id <- 1L to 3L) assert(spans(id) == ((2L, 2L)), s"doc $id")
    assert(spans(4L) == ((3L, 0L)))

    // es1: the whole copy text is cut for every member; solo intact
    val rem = Dedup.removeRepeatedSpans(d, w = 5).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(3)))).toMap
    for (id <- 1L to 3L) assert(rem(id) == (("", 6)), s"doc $id")
    assert(rem(4L) == ((solo, 0)))

    // lm1 differential: corpus bigram counts from a naive ALL-DOCS
    // explode (no collapse) must match the weighted-representative
    // path exactly — the 3 copies triple their bigrams' corpus counts.
    val alpha = 0.5
    val words = d.withColumn("__w", split(Dedup.normalized(col("text")), " "))
    val n1 = greatest(size(col("__w")) - 1, lit(0))
    val big = words.select(col("doc_id"), explode(arrays_zip(
        slice(col("__w"), lit(1), n1), slice(col("__w"), lit(2), n1))).as("p"))
      .select(col("doc_id"), col("p.0").as("prev"), col("p.1").as("cur"))
    val v = words.select(explode(col("__w")).as("w"))
      .agg(count_distinct(col("w"))).head().getLong(0).toDouble
    val cb = big.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    val naive = big.join(cb, Seq("prev", "cur"))
      .join(cb.groupBy("prev").agg(sum("cb").as("cu")), Seq("prev"))
      .withColumn("__lp",
        log((col("cb") + lit(alpha)) / (col("cu") + lit(alpha) * lit(v))))
      .groupBy("doc_id").agg(avg(col("__lp")).as("avg_logp"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = TextAnalysis.perplexity(d, alpha).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getDouble(r.fieldIndex("avg_logp"))).toMap
    assert(got.keySet == naive.keySet)
    for ((id, e) <- naive)
      assert(math.abs(got(id) - e) < 1e-12, s"doc $id: naive=$e got=${got(id)}")
  }

  test("persisted IVF index: probe == in-plan ivfTopK, scan is DPP-pruned") {
    val s = spark
    import s.implicits._
    val em = (0L until 64L).map { i =>
      (i, Seq.tabulate(8)(d => math.sin(i * 7.0 + d).abs + 0.1))
    }.toDF("vec_id", "embedding")
    val root = s"/tmp/graft-test-ivf/${System.nanoTime}"
    graft.llm.Similarity.writeIvfIndex(em, root, nlist = 4)
    // probe side must be a FILTERED SCAN for the DPP rule to fire — a
    // LocalRelation folds the filter away and no pruning subquery is
    // planted (the real query reads parquet, matching this shape)
    em.write.mode("overwrite").parquet(s"$root/em")
    val q = s.read.parquet(s"$root/em").filter(col("vec_id") < 3)
    val viaIndex = graft.llm.Similarity
      .probeIvfIndex(s, root, q, k = 3, nprobe = 2)
    val inPlan = graft.llm.Similarity
      .ivfTopK(em, q, k = 3, nlist = 4, nprobe = 2)
    assert(viaIndex.select("query_id", "corpus_id", "rank").collect().toSet ==
      inPlan.select("query_id", "corpus_id", "rank").collect().toSet)
    // the cells/ scan must carry a runtime partition filter (DPP), not
    // read every cell partition
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the cells scan:\n$plan")
  }

  test("persisted LSH index: probe == in-plan lshTopK, params pinned") {
    val s = spark
    import s.implicits._
    val em = (0L until 48L).map { i =>
      (i, Seq.tabulate(8)(d => math.cos(i * 3.0 + d)))
    }.toDF("vec_id", "embedding")
    val root = s"/tmp/graft-test-lsh/${System.nanoTime}"
    graft.llm.Similarity.writeLshIndex(em, root,
      bitsPerTable = 3, tables = 4)
    em.write.mode("overwrite").parquet(s"$root/em")
    val q = s.read.parquet(s"$root/em").filter(col("vec_id") < 3)
    val viaIndex = graft.llm.Similarity.probeLshIndex(s, root, q, k = 3)
    val inPlan = graft.llm.Similarity.lshTopK(em, q, k = 3,
      bitsPerTable = 3, tables = 4)
    assert(viaIndex.select("query_id", "corpus_id", "rank").collect().toSet ==
      inPlan.select("query_id", "corpus_id", "rank").collect().toSet)
    // bounded query batch → the probed bucket keys are LITERALS: the
    // postings scan must carry a static partition filter on ckp (and
    // pushed ck data filters), not read every posting directory
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [ckp"),
      s"expected static ckp partition pruning on the postings scan:\n$plan")
    assert(plan.contains("DataFilters: [ck#") ||
      plan.contains("In(ck,"),
      "expected ck literal pushdown on the postings scan")
  }

  test("perplexity: add-α bigram LM, hand-computed 2-doc corpus") {
    // d1 = "a b a b", d2 = "a b c"; bigram counts: (a,b)=3 (b,a)=1
    // (b,c)=1; context counts: a·=3, b·=2; V=3, α=0.5
    val got = TextAnalysis.perplexity(docs((1L, "a b A  b"), (2L, "a b c")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val pAB = math.log(3.5 / 4.5)
    val pBA = math.log(1.5 / 3.5)
    val pBC = math.log(1.5 / 3.5)
    val d1 = (2 * pAB + pBA) / 3
    val d2 = (pAB + pBC) / 2
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0)._2 == 3L && got(1)._2 == 2L)
    assert(math.abs(got(0)._3 - d1) < 1e-12)
    assert(math.abs(got(1)._3 - d2) < 1e-12)
    assert(math.abs(got(0)._4 - math.exp(-d1)) < 1e-9)
    // a 1-token doc carries no LM evidence and drops out
    assert(TextAnalysis.perplexity(docs((9L, "solo"))).count() == 0)
  }
}
