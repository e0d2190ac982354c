package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Catalyst expressions (codegen'd per-row work, no shuffle).
  */
object TextAnalysis {

  /** All signals below come from the native single-pass
    * [[graft.functions.TextSignals]] expression (registered as
    * `text_signals` by GraftExtensions): one string traversal inside
    * whole-stage codegen replaces a split-to-array plus several
    * interpreted higher-order functions per signal.
    */
  private def signals(text: Column): Column =
    call_function("text_signals", text)

  /** Whitespace token count. */
  def wordCount(text: Column): Column = signals(text).getField("n_words")

  /** BPE-ish subword token estimate: word-boundary pieces + digits +
    * punctuation each count; long words split every ~4 chars (the
    * common BPE average for English).
    */
  def tokenEstimate(text: Column): Column = {
    val sig = signals(text)
    sig.getField("pieces") + sig.getField("long_word_extra")
  }



  /** Model-based quality scoring, fasttext-style: a linear classifier
    * over hashing-trick bag-of-words features, the standard
    * learned-filter stage of LLM data pipelines (CCNet/LLaMA-style
    * quality classifiers) next to [[qualityFilter]]'s heuristics.
    *
    * Features hash through md5 (engine-portable: the bucket is the
    * first two hex digits, 256 buckets); the weight vector here is a
    * deterministic pseudo-model `w(b) = ((37b+11) mod 101)/50.5 - 1`
    * standing in for trained weights (swap [[bucketWeight]] for a
    * broadcast lookup of real ones). Score = sigmoid(mean token
    * weight). Pure per-row map — transform/aggregate higher-order
    * functions inside whole-stage codegen, no shuffle, no UDF — so the
    * plan scales linearly with the corpus.
    */
  def linearQualityScore(df: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text",
                         weights: Option[Array[Double]] = None): DataFrame = {
    weights.foreach(w => require(w.length == 256,
      s"bucket-weight vector must carry 256 entries, got ${w.length}"))
    // file-loaded weights ride as a 256-double array LITERAL —
    // plan-time broadcast, element_at stays inside codegen; absent,
    // the deterministic pseudo-model arithmetic applies
    val bw: Column => Column = b => weights match {
      case Some(w) => element_at(lit(w), (b + lit(1)).cast("int"))
      case None    => bucketWeight(b)
    }
    val toks = when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val acc = aggregate(toks, lit(0.0),
      (s, w) => s + bw(md5Bucket(w)))
    df.select(col(idCol),
      (lit(1.0) / (lit(1.0) +
        exp(-(acc / greatest(size(toks), lit(1)))))).as("quality_prob"))
  }

  /** The deterministic pseudo-model [[linearQualityScore]] defaults
    * to, as a materializable vector — so the trained-weights ARTIFACT
    * door below can ship it (and specs can pin file-loaded ==
    * arithmetic, byte for byte). */
  def pseudoBucketWeights: Array[Double] =
    Array.tabulate(256)(b => ((b * 37 + 11) % 101).toDouble / 50.5 - 1.0)

  /** Trained-weights door: persist a 256-bucket weight vector as a
    * (bucket, weight) parquet artifact a training job would produce.
    */
  def writeBucketWeights(spark: org.apache.spark.sql.SparkSession,
                         path: String, weights: Array[Double]): Unit = {
    require(weights.length == 256,
      s"bucket-weight vector must carry 256 entries, got ${weights.length}")
    import spark.implicits._
    weights.zipWithIndex.map { case (w, b) => (b, w) }.toSeq
      .toDF("bucket", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a (bucket, weight) parquet artifact into the scorer's dense
    * vector form, validating full 0..255 coverage — a sparse or
    * duplicated artifact is a broken model export, not a scorable one.
    */
  def loadBucketWeights(spark: org.apache.spark.sql.SparkSession,
                        path: String): Array[Double] = {
    val rows = spark.read.parquet(path).select("bucket", "weight")
      .collect().map(r => r.getAs[Number](0).intValue() -> r.getDouble(1))
    require(rows.length == 256 && rows.map(_._1).sorted.sameElements(0 until 256),
      s"weights artifact at $path must carry each bucket 0..255 exactly " +
        s"once (got ${rows.length} rows)")
    val w = new Array[Double](256)
    rows.foreach { case (b, v) => w(b) = v }
    w
  }

  /** Hashing-trick bucket 0..255 from the first two md5 hex digits —
    * the same arithmetic is expressible in any engine with md5 +
    * strpos, which is what makes the scorer oracle-checkable. */
  private def md5Bucket(w: Column): Column = {
    val hexDigits = "0123456789abcdef"
    (instr(lit(hexDigits), substring(md5(w), 1, 1)) - 1) * 16 +
      (instr(lit(hexDigits), substring(md5(w), 2, 1)) - 1)
  }

  private def bucketWeight(b: Column): Column =
    ((b * 37 + 11) % 101).cast("double") / 50.5 - 1.0

  /** Quality signals (length, punctuation ratio, stopword ratio, mean
    * word length) + a composite score in [0, 1]. Heuristics in the
    * spirit of C4/Gopher quality filters.
    */
  def qualitySignals(df0: DataFrame, textCol: String = "text"): DataFrame = {
    val df = df0.withColumn("__sig", signals(col(textCol)))
    val sig = col("__sig")
    val nWords = sig.getField("n_words")
    val nChars = sig.getField("n_chars")
    val punct = sig.getField("n_punct")
    val stopHits = sig.getField("n_stop")
    df.withColumn("n_words", nWords)
      .withColumn("n_chars_m", nChars)
      .withColumn("punct_ratio",
        when(nChars > 0, punct.cast("double") / nChars).otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nWords > 0, stopHits.cast("double") / nWords).otherwise(0.0))
      .withColumn("mean_word_len",
        when(nWords > 0,
          sig.getField("word_len_sum").cast("double") / nWords)
          .otherwise(0.0))
      .withColumn("quality_score",
        least(lit(1.0), greatest(lit(0.0),
          lit(0.25) * least(nWords.cast("double") / 50.0, lit(1.0))
            + lit(0.25) * least(col("stopword_ratio") * 5.0, lit(1.0))
            + lit(0.25) * (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0)))
            + lit(0.25) * when(col("mean_word_len").between(3.0, 10.0), 1.0)
                .otherwise(0.0))))
      .drop("__sig")
  }

  /** Language-ID n-gram heuristic: score each candidate language by its
    * marker-token hit rate; emit the argmax and its score. Marker sets
    * are tiny in-plan literal arrays — at scale this is a pure map
    * stage.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "que", "dans"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "por", "como"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这", "不", "们"))

  /** One language's marker hit rate. Whitespace languages score
    * marker-TOKEN hits over the word count; zh text is unsegmented
    * (no whitespace tokens, so token equality can never match a
    * single-character marker) and scores marker-CHARACTER occurrences
    * over the non-space character count instead.
    */
  private def markerScore(t: Column, words: Column, nWords: Column,
                          lang: String, markers: Seq[String]): Column =
    if (lang == "zh") {
      val nChars =
        greatest(length(regexp_replace(t, "\\s+", "")), lit(1)).cast("double")
      markers.map(m =>
          (length(t) - length(translate(t, m, ""))).cast("double"))
        .reduce(_ + _) / nChars
    } else size(filter(words, w => w.isin(markers: _*))) / nWords

  /** Per-language marker hit rates as columns `<lang>_score`. */
  def languageScores(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = lower(trim(col(textCol)))
    val words = split(t, "\\s+")
    val n = greatest(size(words), lit(1)).cast("double")
    langMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"${lang}_score", markerScore(t, words, n, lang, markers))
    }
  }

  def languageId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = lower(trim(col(textCol)))
    val words = split(t, "\\s+")
    val n = greatest(size(words), lit(1)).cast("double")
    val scored = langMarkers.map { case (lang, markers) =>
      struct(markerScore(t, words, n, lang, markers).as("score"),
             lit(lang).as("lang"))
    }
    df.withColumn("__best", greatest(scored: _*))
      // an all-zero score row has NO language signal: the struct
      // greatest would tie-break on the lexicographically largest
      // language string (systematically "zh") — label it "und" instead
      .withColumn("lang_pred",
        when(col("__best.score") > 0, col("__best.lang")).otherwise(lit("und")))
      .withColumn("lang_score", col("__best.score"))
      .drop("__best")
  }

  /** Repetition signals in the spirit of the Gopher quality filters
    * (Rae et al. 2021 §A1.1): the fraction of non-blank lines that are
    * duplicates of another line in the same document, and the fraction
    * of word 2-gram occurrences taken by the single most frequent
    * 2-gram. High values flag boilerplate / machine-generated text.
    *
    * Both signals come from the native single-pass
    * [[graft.functions.RepetitionSignals]] expression (registered as
    * `repetition_signals`): one string traversal with a small per-row
    * hash table, inside whole-stage codegen. The Column formulations
    * (explode + two-level hash aggregation, or per-row sort + HOF
    * aggregate) measured 17 s / 10 s on the 32×-amplified corpus —
    * corpus-wide gram shuffles in the first case, interpreted
    * per-element lambda frames in the second. Both ratios are 0 for
    * documents without lines/grams.
    */
  def repetitionSignals(df: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val sig = call_function("repetition_signals", col(textCol))
    df.withColumn("__rep", sig)
      .withColumn("dup_line_frac",
        when(col("__rep.n_lines") > 0,
          col("__rep.n_dup_lines").cast("double") / col("__rep.n_lines"))
          .otherwise(0.0))
      .withColumn("top_2gram_frac",
        when(col("__rep.n_grams") > 0,
          col("__rep.top_gram").cast("double") / col("__rep.n_grams"))
          .otherwise(0.0))
      .drop("__rep")
  }

  /** PII patterns kept to the regex intersection of Java regex and RE2
    * (char classes, bounded quantifiers, \b, non-capturing groups) so
    * independent engines replay them identically. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** PII detection + scrubbing: per-document match counts for emails /
    * IPv4 addresses / NANP-style phone numbers, and a `scrubbed` text
    * column with each class replaced by a typed placeholder. Pure
    * codegen'd per-row regex work — a map stage at any scale. Scrub
    * order (email → ip → phone) is fixed so results are deterministic
    * when classes overlap textually.
    */
  def piiSignals(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(emailRe)).cast("long"))
      .withColumn("n_ipv4", regexp_count(col(textCol), lit(ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(col(textCol), lit(phoneRe)).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), emailRe, "<EMAIL>"),
            ipv4Re, "<IP>"),
          phoneRe, "<PHONE>"))

  /** Composite quality filter in the Gopher/C4 style: combine the
    * [[qualitySignals]] and [[repetitionSignals]] measurements into a
    * keep/drop decision with a `reasons` bitmask (1 = too short,
    * 2 = low stopword ratio, 4 = high punctuation, 8 = word length out
    * of range, 16 = repetitive top 2-gram). One signal pass + the
    * 2-gram aggregation — thresholds are plain column predicates on
    * exact integer ratios, so the decision replays bit-identically in
    * any engine.
    */
  def qualityFilter(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    minWords: Int = 40, minStopRatio: Double = 0.04,
                    maxPunctRatio: Double = 0.10,
                    minMeanWordLen: Double = 3.0,
                    maxMeanWordLen: Double = 10.0,
                    maxTop2GramFrac: Double = 0.06): DataFrame = {
    val sig = repetitionSignals(qualitySignals(df, textCol), idCol, textCol)
    sig
      .withColumn("reasons",
        when(col("n_words") < minWords, 1L).otherwise(0L) +
        when(col("stopword_ratio") < minStopRatio, 2L).otherwise(0L) +
        when(col("punct_ratio") > maxPunctRatio, 4L).otherwise(0L) +
        when(!col("mean_word_len").between(minMeanWordLen, maxMeanWordLen), 8L)
          .otherwise(0L) +
        when(col("top_2gram_frac") > maxTop2GramFrac, 16L).otherwise(0L))
      .withColumn("keep", (col("reasons") === 0L).cast("long"))
  }

  /** Winnowing fingerprint, SQL-replicable variant: word k-gram md5
    * hex digests compared lexicographically; per-window minima
    * (winnowing, Schleimer et al. 2003) collected as a sorted distinct
    * comma-joined set, plus md5 content hash. Same selection semantics
    * as [[fingerprint]] — winnowing only needs a total order on a
    * well-mixed hash — but every step is ANSI-SQL-expressible, so an
    * independent engine can replay it bit-for-bit. Edge cases: fewer
    * than `k` words → fingerprint = content hash; fewer than `window`
    * k-grams → single global minimum.
    */
  def fingerprintSql(df: DataFrame, textCol: String = "text",
                     k: Int = 3, window: Int = 4): DataFrame = {
    val norm = Dedup.normalized(col(textCol))
    val d1 = df.withColumn("__w", split(norm, " "))
      .withColumn("__nk", size(col("__w")) - (k - 1))
    // k-gram md5s in POSITIONAL order (winnowing is order-sensitive —
    // no distinct here); the when() guards matter: sequence(1, 0)
    // would count DOWN, not produce an empty array
    val grams = transform(sequence(lit(1), col("__nk")),
      i => md5(concat_ws(" ",
        (0 until k).map(j => element_at(col("__w"), i + j)): _*)))
    val d2 = d1.withColumn("__h",
        when(col("__nk") >= 1, grams).otherwise(array().cast("array<string>")))
      .withColumn("__nw", size(col("__h")) - (window - 1))
    val mins = transform(sequence(lit(1), col("__nw")),
      j => array_min(slice(col("__h"), j, lit(window))))
    d2.withColumn("content_hash", md5(norm))
      .withColumn("winnow_fp",
        when(col("__nw") >= 1,
          array_join(array_sort(array_distinct(mins)), ","))
          .when(size(col("__h")) >= 1, array_min(col("__h")))
          .otherwise(md5(norm)))
      .drop("__w", "__nk", "__h", "__nw")
  }

  /** Document fingerprint: 64-bit content hash of normalized text
    * (xxhash64) + a SINGLE rolling-hash sketch value: each word is
    * hashed once, consecutive `window`-word hashes combine through
    * rotate-XOR, and the GLOBAL minimum window hash is kept — a
    * 1-permutation MinHash over word windows. That is a cheap
    * doc-level near-dup prefilter (equal sketch ⇒ the docs share
    * their minimal window), NOT a winnowing fingerprint SET: for the
    * Schleimer-et-al guarantee (any shared run ≥ k+window−1 words
    * yields a shared fingerprint) use [[fingerprintSql]], which the
    * txt4/dd8 pipelines build on. Pure long arithmetic after one hash
    * pass — no n-gram string materialization.
    */
  def fingerprint(df: DataFrame, textCol: String = "text",
                  window: Int = 5): DataFrame = {
    val norm = Dedup.normalized(col(textCol))
    def rotl(c: Column, r: Int): Column =
      shiftleft(c, r).bitwiseOR(shiftrightunsigned(c, 64 - r))
    // Hash every word once into a named column, then roll by XOR-ing
    // `window` position-rotated SLICES of that column zip_with'd
    // together — all array references are row-level, so the work per
    // document is O(window · words), never O(words²).
    val withWh = df
      .withColumn("__wh", transform(split(norm, " "), w => xxhash64(w)))
      .withColumn("__n", size(col("__wh")) - (window - 1))
    val shifted = (0 until window).map { j =>
      transform(slice(col("__wh"), lit(j + 1), greatest(col("__n"), lit(1))),
        h => rotl(h, 1 + j * 7))
    }
    // every slice has exactly max(__n, 1) elements, so zip_with never
    // null-pads — plain XOR, no null guards needed
    val rolling = shifted.reduce((a, b) => zip_with(a, b, _ bitwiseXOR _))
    withWh
      .withColumn("content_hash", xxhash64(norm))
      .withColumn("winnow_fp",
        when(col("__n") >= 1, array_min(rolling))
          .otherwise(xxhash64(norm)))
      .drop("__wh", "__n")
  }

  /** Corpus vocabulary statistics: document frequency and smoothed
    * inverse document frequency per token (the IDF table a training
    * pipeline uses for rare-token filtering, TF-IDF keyword
    * extraction, and vocabulary pruning). Tokens are whitespace words
    * of the normalized text, counted once per document
    * (`array_distinct` before the explode — the explode then carries
    * distinct (doc, token) pairs only); `idf = ln(n_docs / df)` with
    * the document count attached by broadcasting a 1-row aggregate, so
    * the whole table is two shuffles (token agg + the final order) and
    * no driver-side collect.
    *
    * At 100 TB the token aggregate is the classic word-count shape —
    * map-side combine absorbs hot tokens; the output is vocabulary-
    * sized, not corpus-sized.
    */
  def docFrequency(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    // the tokenized frame feeds BOTH the doc-count aggregate and the
    // token stream; Catalyst does not dedupe shared subplans, so
    // unpersisted this would tokenize the corpus twice (OpCaches:
    // released by the caller once results are materialized)
    // array_remove strips the phantom "" token split() yields for
    // empty/whitespace-only text — otherwise those docs pass the
    // size>0 guard, count into n_docs, and inflate every idf by
    // ln(n_total/n_nonempty)
    val docs = OpCaches.persist(df.select(col(idCol),
      array_remove(array_distinct(
        split(Dedup.normalized(col(textCol)), " ")), "").as("__toks"))
      .filter(size(col("__toks")) > 0))
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    docs.select(explode(col("__toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        log(col("__n_docs").cast("double") / col("df").cast("double")))
      .select(col("token"), col("df"), col("idf"))
  }

  /** Canonicalize a URL for dedup: lowercase, strip scheme and
    * leading `www.`, drop query/fragment, drop a trailing slash —
    * the common-crawl-style key under which `http://example.com/p/`
    * and `https://WWW.Example.com/p/?utm=x#top` are one page. */
  def urlNormalize(url: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      lower(url),
      "^https?://", ""), "^www\\.", ""), "[?#].*$", ""), "/$", "")

  /** URL-level dedup: extract the first URL per document, canonicalize
    * ([[urlNormalize]]), and group — one row per distinct page with
    * occurrence count and canonical (minimum) doc id. Pure map +
    * one hash aggregate on the normalized-url key; document bodies
    * never shuffle.
    */
  def urlDedup(df: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    df.withColumn("__url",
        regexp_extract(col(textCol), "(?i)https?://\\S+", 0))
      .filter(col("__url") =!= "")
      .withColumn("url_norm", urlNormalize(col("__url")))
      .groupBy("url_norm")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  /** Corpus term statistics: the `topK` most frequent terms with rank,
    * corpus share, and cumulative share (the Zipf-curve head — the
    * standard first look at a pretraining corpus's token distribution,
    * and the input to stopword/boilerplate cutoff decisions).
    *
    * Scale shape: the term count is one map-side-combined aggregate
    * (vocabulary-sized output); the top-K is a `TakeOrderedAndProject`
    * (per-partition heaps, no global sort); rank and cumulative share
    * then run over the K-row result — the only single-task work is over
    * K rows, never the vocabulary. Total term mass rides in as a
    * broadcast scalar.
    */
  def termStats(df: DataFrame, textCol: String = "text",
                topK: Int = 100): DataFrame = {
    // two consumers (total + topK) — Catalyst does not dedupe shared
    // subplans, so unpinned the corpus explode+aggregate runs twice
    val counts = OpCaches.persist(df
      .select(explode(split(Dedup.normalized(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("freq")))
    val total = counts.agg(sum(col("freq")).as("__total"))
    val top = counts.orderBy(col("freq").desc, col("term")).limit(topK)
    val w = Window.orderBy(col("freq").desc, col("term"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      // float32 quantization for cross-engine stability — decimal
      // ROUND of a double differs between Spark (BigDecimal HALF_UP on
      // the shortest repr) and DuckDB (scaled std::round) exactly on
      // repr-boundary values
      .withColumn("share",
        (col("freq").cast("double") / col("__total")).cast("float"))
      .withColumn("cum_share",
        (sum(col("freq")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("__total")).cast("float"))
      .select(col("rank"), col("term"), col("freq"), col("share"),
        col("cum_share"))
  }

  /** Bigram-LM perplexity per document (the CCNet-style LM quality
    * signal: score documents with an n-gram language model and filter
    * the tails — Wenzek et al. 2020; no reference-repo analogue,
    * SURVEY §2.12). Add-α smoothing:
    * P(cur|prev) = (c(prev,cur) + α) / (c(prev·) + α·V), V = |vocab|;
    * per doc: avg_logp = Σ k·ln P / Σ k over its bigrams,
    * ppl = exp(−avg_logp). Documents with < 2 tokens have no bigram
    * and drop out (they carry no LM evidence).
    *
    * Scale shape: (1) per-doc bigram pre-aggregation — ONE shuffle of
    * the doc-distinct bigram set (map-side combine collapses repeated
    * bigrams, which natural text has plenty of); (2)+(3) corpus counts
    * c(prev,cur) and c(prev·) as HASH AGGREGATES joined back, never as
    * window sums: a window partitioned by (prev) is Zipf-skewed — every
    * bigram starting with "the" lands in ONE sorted window partition,
    * and window skew cannot be split by AQE the way join skew can. The
    * aggregate + shuffled-hash join shape is sort-free and AQE
    * skew-splittable; c(prev·) folds from the already-reduced
    * c(prev,cur) table, not the raw bigram stream. (4) one per-doc
    * aggregation. The vocabulary size rides in as a broadcast scalar —
    * no collect in the data path. Raw token streams are never joined;
    * only the deduplicated (doc, bigram) table shuffles.
    */
  def perplexity(df: DataFrame, alpha: Double = 0.5,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    // Exact copies collapse to weighted representatives (the dd2/es1
    // pattern): the bigram stream shrinks by the copy factor; corpus
    // counts c(prev,cur) scale each representative's contribution by
    // its group size `__gs`, so they equal the all-docs counts
    // exactly; the vocabulary is a distinct set, unchanged by copies;
    // per-doc scores are pure content functions of those corpus
    // statistics and expand back per member at the end.
    val groups = OpCaches.persist(Dedup.collapseExact(df, idCol, textCol))
    // tokenize ONCE and pin it: normalize+split is the CPU-heavy scan
    // work, and the plan has two independent consumers (the bigram
    // stream and the vocabulary) — unpinned, each branch re-normalizes
    // the corpus (profiled at ~1.3 s/pass of the 4.6 s total at 32×)
    val withWords = OpCaches.persist(
      Dedup.rebalance(Dedup.collapseRepsW(df, groups, idCol))
        // array_remove: an empty doc's phantom "" token must not
        // enter the vocabulary (V) of the add-alpha smoothing
        .withColumn("__w",
          array_remove(split(Dedup.normalized(col(textCol)), " "), ""))
        .select(col(idCol), col("__gs"), col("__w")))
    val n1 = greatest(size(col("__w")) - 1, lit(0))
    val dp = withWords
      .select(col(idCol), col("__gs"), explode(arrays_zip(
        slice(col("__w"), lit(1), n1), slice(col("__w"), lit(2), n1))).as("p"))
      .select(col(idCol), col("__gs"), col("p.0").as("prev"), col("p.1").as("cur"))
      .groupBy(col(idCol), col("prev"), col("cur"))
      .agg(count(lit(1)).as("k"), first(col("__gs")).as("__gs"))
    val vocab = withWords
      .select(explode(col("__w")).as("w"))
      .agg(count_distinct(col("w")).as("__v"))
    val cb = dp.groupBy(col("prev"), col("cur"))
      .agg(sum(col("k") * col("__gs")).as("cb"))
    // fold c(prev·) INTO the bigram-count table before meeting dp: cu
    // rides the (distinct-bigram-sized) cb through one cheap shuffle,
    // and the corpus-sized dp then shuffles ONCE on (prev, cur) —
    // the old dp⋈cb⋈cu shape reshuffled dp a second time on (prev)
    val cu = cb.groupBy(col("prev"))
      .agg(sum(col("cb")).as("cu"))
    val cbu = cb.join(cu.hint("shuffle_hash"), Seq("prev"))
    val repOut = dp.join(cbu.hint("shuffle_hash"), Seq("prev", "cur"))
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", log((col("cb") + lit(alpha)) /
        (col("cu") + lit(alpha) * col("__v"))))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_bigrams"),
        (sum(col("k") * col("__lp")) / sum(col("k"))).as("avg_logp"))
      .withColumn("ppl", exp(-col("avg_logp")))
    Dedup.expandDocs(repOut, groups, idCol,
      Seq("n_bigrams", "avg_logp", "ppl"))
  }
}
