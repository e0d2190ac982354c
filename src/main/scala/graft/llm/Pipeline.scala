package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dataset-assembly operators for training-data pipelines: deterministic
  * sampling and split assignment, sequence packing, and benchmark
  * decontamination. Greenfield (no reference citation — these extend the
  * engine toward the LLM-pipeline north star); everything is seeded by
  * content-independent id hashes so reruns and backfills are
  * reproducible across cluster sizes and partitionings.
  */
object Pipeline {

  /** Deterministic stratified sampling: the `k` documents per stratum
    * whose md5(id) sorts lowest — a reproducible uniform draw without a
    * seed-and-shuffle (rerunning over a grown corpus keeps previously
    * sampled ids stable except where new ids hash below the old kth).
    *
    * Scale shape: `row_number` under a `<= k` filter becomes a
    * WindowGroupLimit in Spark 3.5+ — per-partition top-k heaps run
    * map-side BEFORE the shuffle, so each stratum moves at most
    * (k × input partitions) rows, not its full population.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, k: Int,
                       idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Deterministic train/val/test split on a salted id hash: a document
    * keeps its split for life regardless of corpus growth, partitioning,
    * or cluster size (the property a seeded `randomSplit` lacks). Split
    * fractions are hex-prefix thresholds on the md5 digest — lexicographic
    * compare of lowercase hex, so any engine can replay the assignment.
    * Defaults: test ≈ 13/256, val ≈ (26−13)/256, train = rest.
    */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
                salt: String = "graft",
                testHexLt: String = "0d", valHexLt: String = "1a"): DataFrame = {
    // md5() emits LOWERCASE hex — an uppercase threshold like "0D"
    // would silently skew the split ('a'-'f' sort above 'A'-'F'), and
    // test >= val silently empties the val split
    Seq("testHexLt" -> testHexLt, "valHexLt" -> valHexLt).foreach {
      case (n, v) => require(v.nonEmpty && v.matches("[0-9a-g]+"),
        s"$n must be lowercase hex (or the keep-all sentinel 'g'), got '$v'")
    }
    require(testHexLt < valHexLt,
      s"testHexLt '$testHexLt' must sort below valHexLt '$valHexLt' — " +
        "equal or inverted thresholds silently empty the val split")
    df.withColumn("__h", md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .withColumn("split",
        when(col("__h") < testHexLt, "test")
          .when(col("__h") < valHexLt, "val")
          .otherwise("train"))
      .drop("__h")
  }

  /** Sequence packing: lay documents out in a deterministic global order
    * (strata ascending, id ascending within) and chunk the concatenated
    * token stream into fixed `budget`-token context windows — documents
    * split across window boundaries, GPT-style pretraining packing.
    * Emits `token_offset` (global stream position of the document's
    * first token) and the `[first_win, last_win]` window range.
    *
    * Scale shape: a single global running sum serializes into ONE window
    * task. Instead the running sum is per-stratum (parallel tasks), and
    * each stratum's global base offset comes from a prefix sum over the
    * per-stratum totals — a frame of |strata| rows, broadcast back. The
    * only single-task work is the tiny totals prefix.
    */
  def packChunks(df: DataFrame, tokens: Column, budget: Int,
                 strataCol: String, idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val base = df.withColumn("__t", tokens.cast("long"))
    val wIn = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = base.withColumn("__cum_in",
      coalesce(sum(col("__t")).over(wIn), lit(0L)))
    val totals = base.groupBy(strataCol).agg(sum(col("__t")).as("__tot"))
    val wTot = Window.orderBy(col(strataCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__tot")).over(wTot), lit(0L)))
      .select(col(strataCol).as("__off_key"), col("__off"))
    // null-safe join: a null stratum is a legitimate group (the window
    // and groupBy both treat null as one partition) — a USING join
    // would silently drop those rows while their tokens still shifted
    // every later stratum's offset
    within.join(broadcast(offsets),
        within(strataCol) <=> offsets.col("__off_key"), "inner")
      .drop("__off_key")
      .withColumn("token_offset", col("__cum_in") + col("__off"))
      .withColumn("first_win",
        floor(col("token_offset") / budget).cast("long"))
      .withColumn("last_win",
        floor((col("token_offset") + greatest(col("__t"), lit(1L)) - 1) / budget)
          .cast("long"))
      .drop("__t", "__cum_in", "__off")
  }

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with an eval/benchmark set — the standard n-gram-overlap
    * rule for scrubbing test-set leakage out of pretraining data.
    * Returns `(id, n_hit_grams)` for contaminated documents only
    * (n_hit_grams = distinct shared n-grams).
    *
    * Scale shape: the benchmark gram set is tiny relative to the corpus
    * — distinct 64-bit gram hashes, broadcast — so the corpus side is
    * one explode + broadcast hash join + partial-aggregated groupBy:
    * no shuffle of document bodies, no corpus self-join. Exact copies
    * collapse to one representative FIRST ([[Dedup.collapseExact]]):
    * contamination is a pure function of document content, so a
    * 32-way copy group shingles once and the verdict expands back to
    * every member — on the copy-heavy corpora 100 TB crawls actually
    * are, the dominant shingling CPU divides by the copy rate.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, n: Int = 8,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    // the returned plan reads `groups`, so its cache entry must outlive
    // this call — registered with OpCaches for explicit release
    val groups = OpCaches.persist(Dedup.collapseExact(corpus, idCol, textCol))
    val reps = Dedup.collapseReps(corpus, groups, idCol)
    val cg = Dedup.withShingles(Dedup.rebalance(reps), textCol, n, "__sh")
      .select(col(idCol).as("id"), explode(col("__sh")).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gh"))
    val bg = Dedup.withShingles(bench, textCol, n, "__sh")
      .select(explode(col("__sh")).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
    val repHits = cg.join(broadcast(bg), Seq("gh"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_hit_grams"))
    Dedup.expandDocs(repHits, groups, idCol, Seq("n_hit_grams"))
  }

  /** Fuzzy benchmark decontamination: flag corpus documents whose
    * n-gram Jaccard similarity with any benchmark document clears
    * `threshold` — the MinHash-LSH complement of [[decontaminate]]'s
    * exact-gram rule, catching paraphrased or lightly edited benchmark
    * leakage that exact matching misses. Returns one row per
    * contaminated (corpus doc, bench doc) pair: `(id, bench_id,
    * jaccard)`.
    *
    * Scale shape: the corpus side NEVER shuffles. A benchmark set is
    * thousands of documents against a 100 TB corpus, so the bench band
    * keys and bench shingle-hash arrays both ride as broadcasts;
    * candidate generation is a broadcast hash join on the band bucket
    * over the corpus band stream (map-side, the band index is salted
    * into the bucket hash), and the exact-Jaccard verify re-shingles
    * ONLY candidate docs (broadcast semi-join on the hit id set before
    * any per-doc work). The single shuffle in the plan is the distinct
    * over candidate ID PAIRS — 16 bytes per hit, not documents.
    * Signatures use the same fused native `minhash_sig` as
    * [[Dedup.minhashLsh]] (no k× row amplification). Exact copies
    * collapse to one representative first ([[Dedup.collapseExact]]) —
    * Jaccard against the bench set is a pure function of document
    * content, so signatures and the candidate verify run once per
    * DISTINCT text and the `(bench_id, jaccard)` verdicts expand back
    * to every copy-group member at the end.
    */
  def fuzzyDecontaminate(corpus: DataFrame, bench: DataFrame, n: Int = 3,
                         numHashes: Int = 64, bands: Int = 16,
                         threshold: Double = 0.5,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must divide into bands ($bands)")
    val rows = numHashes / bands
    def hashedShingles(df: DataFrame, outId: String): DataFrame =
      Dedup.withShingles(Dedup.rebalance(df), textCol, n, "__sh")
        .select(col(idCol).as(outId),
          transform(col("__sh"), s => xxhash64(s)).as("shh"))
    def banded(sh: DataFrame, outId: String): DataFrame = {
      val sig = sh.select(col(outId),
        call_function("minhash_sig", col("shh"), lit(numHashes)).as("__sig"))
      // Dedup.bandBucketCols: the ONE band-bucket formula — candidate
      // recall silently diverges if the two sides ever drift
      sig.select(col(outId), explode(array(
        Dedup.bandBucketCols(col("__sig"), bands, rows): _*)).as("bucket"))
    }
    // registered with OpCaches: the returned plan reads `groups` (see
    // decontaminate)
    val groups = OpCaches.persist(Dedup.collapseExact(corpus, idCol, textCol))
    val reps = Dedup.collapseReps(corpus, groups, idCol)
    val bSh = hashedShingles(bench, "bench_id")
    val cand = banded(hashedShingles(reps, "__cid"), "__cid")
      .join(broadcast(banded(bSh, "bench_id")), Seq("bucket"))
      .select(col("__cid").as(idCol), col("bench_id")).distinct()
    // Shingle-less docs share the degenerate all-MaxValue signature and
    // can band together; the exact verify discards them (0/0 = NULL
    // fails every threshold), mirroring minhashLsh.
    val candIds = cand.select(col(idCol)).distinct()
    val cSh = hashedShingles(
      reps.join(broadcast(candIds), Seq(idCol), "left_semi"), idCol)
    val repHits = cand.join(cSh, Seq(idCol))
      .join(broadcast(bSh.withColumnRenamed("shh", "__bsh")), Seq("bench_id"))
      .withColumn("jaccard",
        // try_divide, NOT `/`: under ANSI a 0/0 (two shingle-less docs
        // banded together via the degenerate all-MaxValue signature)
        // would abort the job; NULL fails every threshold instead
        try_divide(
          size(array_intersect(col("shh"), col("__bsh"))).cast("double"),
          size(array_union(col("shh"), col("__bsh"))).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col(idCol), col("bench_id"), col("jaccard"))
    Dedup.expandDocs(repHits, groups, idCol, Seq("bench_id", "jaccard"))
  }

  /** Sliding-window chunking: split each document's token stream into
    * fixed-`size` windows every `stride` tokens (stride = size →
    * disjoint; stride < size → overlapping context windows). The
    * training-prep step between cleaning and packing: long documents
    * become model-length sequences, short documents pass through as
    * one window. A window starts at every `k·stride < n_tokens` and
    * covers `[start, min(start+size, n))`; empty documents emit
    * nothing. Emits `(id, chunk_idx, tok_start, n_tokens,
    * chunk_text)`. `chunk_text` is whitespace-NORMALIZED (runs of
    * whitespace collapse to single spaces — a consequence of the
    * token stream being the unit of chunking) but CASE-PRESERVING:
    * a training-prep operator must not lowercase the corpus it emits.
    *
    * Scale shape: pure map — tokens from one split, windows from one
    * `sequence` explode, text by array slice. No shuffle, no state,
    * no cross-document dependency; output row count is
    * Σ ceil(n_tokens/stride).
    */
  def chunkDocs(df: DataFrame, size: Int, stride: Int,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size: size=$size stride=$stride")
    val norm = trim(regexp_replace(col(textCol), "\\s+", " "))
    val base = Dedup.rebalance(df)
      .withColumn("__w", split(norm, " "))
      .withColumn("__n",
        when(length(norm) === 0, lit(0)).otherwise(array_size(col("__w"))))
      .filter(col("__n") > 0)
    base.select(col(idCol), col("__w"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("tok_start"),
        least(lit(size.toLong), col("__n") - col("col")).cast("long")
          .as("n_tokens"),
        col("__w"), col("col"))
      .withColumn("chunk_text", array_join(
        slice(col("__w"), col("col") + 1, col("n_tokens").cast("int")), " "))
      .drop("__w", "col")
  }

  /** Semantic (embedding-space) decontamination: flag corpus vectors
    * whose cosine against any benchmark vector clears `threshold` —
    * catches rewrites that n-gram overlap ([[fuzzyDecontaminate]])
    * misses entirely. Emits one row per flagged corpus doc:
    * `(id, best_cosine, n_hits)` — the max bench cosine and how many
    * bench vectors clear the threshold.
    *
    * Scale shape: the benchmark set rides ENTIRELY as a broadcast (a
    * bench set is thousands of vectors against a 100 TB corpus); every
    * corpus row scores map-side (native `vec_dot`) and its (max,
    * count) partial-aggregates before the single exchange of per-id
    * scalars. No corpus-side sort, window, or vector shuffle. With
    * `nlist`/`nprobe` > 0 a bench-side IVF prunes per-row flops:
    * centroids become plan-time literals probed by the fused
    * `vec_top_cells`, and only bench members of the probed cells are
    * scored — recall then depends on the bench clustering (pin it
    * with a spec at your parameters; the exact arm is what the
    * oracle gates).
    */
  def semanticDecontaminate(corpusEm: DataFrame, benchEm: DataFrame,
                            threshold: Double = 0.8,
                            nlist: Int = 0, nprobe: Int = 0,
                            iters: Int = 3,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    // norms ride as per-ROW columns computed before the join — the
    // pair loop then does one vec_dot + one multiply, not three dots;
    // sqrt(a·a) here is the identical double l2norm would produce
    // inside cosine(), so values are bit-unchanged
    val c = corpusEm.select(col(idCol), col(vecCol).as("__cv"),
      Similarity.l2norm(col(vecCol)).as("__cn"))
    val b0 = benchEm.select(col(idCol).as("__bid"), col(vecCol).as("__bv"),
      Similarity.l2norm(col(vecCol)).as("__bn"))
    val scored =
      if (nlist > 0 && nprobe > 0) {
        val centroids = Similarity.kmeansCentroids(benchEm, nlist, iters,
          idCol = idCol, vecCol = vecCol)
        // each bench member lives in exactly one cell (top-1), so a
        // corpus row probing nprobe cells scores each member at most
        // once — no post-join distinct needed
        val bcells = b0.select(col("__bid"), col("__bv"), col("__bn"),
            explode(Similarity.topCells(col("__bv"), centroids, 1)).as("__tc"))
          .select(col("__bid"), col("__bv"), col("__bn"),
            col("__tc.cell").as("__cell"))
        c.select(col(idCol), col("__cv"), col("__cn"),
            explode(Similarity.topCells(col("__cv"), centroids, nprobe))
              .as("__tc"))
          .select(col(idCol), col("__cv"), col("__cn"),
            col("__tc.cell").as("__cell"))
          .join(broadcast(bcells), Seq("__cell"))
      } else c.crossJoin(broadcast(b0))
    scored
      .withColumn("__cos",
        try_divide(Similarity.dot(col("__cv"), col("__bv")), col("__cn") * col("__bn")))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("best_cosine"),
        sum(when(col("__cos") >= threshold, 1L).otherwise(0L)).as("n_hits"))
      .filter(col("best_cosine") >= threshold)
  }

  /** Deterministic domain-mixture sampling: down-sample each group
    * (source/domain/language) to a target rate so the retained corpus
    * matches a prescribed mixture. Rates are hex-prefix thresholds on a
    * salted md5 of the id, exactly like [[hashSplit]]: `"80"` keeps
    * ≈ 128/256 of the group, `"40"` ≈ 64/256, `"ff..."`/absent-group
    * semantics are explicit (groups without a configured rate are
    * DROPPED — a mixture definition is a whitelist). Membership is a
    * pure function of (salt, id), so re-running over a grown corpus
    * never flips previously retained documents.
    *
    * Scale shape: a single narrow filter — no shuffle, no sampling
    * state, no seed coordination across executors.
    */
  def mixtureSample(df: DataFrame, rates: Seq[(String, String)],
                    groupCol: String, idCol: String = "doc_id",
                    salt: String = "mix"): DataFrame = {
    require(rates.nonEmpty, "mixtureSample: empty mixture definition")
    rates.foreach { case (g, hex) =>
      // every md5 hex char sorts below 'g', so "g" is the documented
      // keep-the-whole-group sentinel
      require(hex.nonEmpty && hex.matches("[0-9a-g]+"),
        s"mixtureSample: rate for '$g' must be lowercase hex or 'g', " +
          s"got '$hex' (md5 emits lowercase — an uppercase threshold " +
          "skews the kept fraction)")
    }
    val h = md5(concat(lit(salt), lit(":"), col(idCol).cast("string")))
    val thr = rates.foldLeft(lit(null).cast("string")) {
      case (acc, (g, hex)) => when(col(groupCol) === g, lit(hex)).otherwise(acc)
    }
    df.filter(h < thr)
  }
}
