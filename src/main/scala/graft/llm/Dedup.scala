package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * All stages are pure Catalyst expressions (whole-stage codegen, no
  * UDFs): shingling via `split`/`transform`, hashing via `xxhash64`,
  * minhash via array `aggregate`, banding via `groupBy` — so the LSH
  * candidate generation is a single shuffle on the band key and scales
  * linearly with corpus size instead of O(n²) pairwise comparison.
  */
object Dedup {

  /** THE band-bucket formula of MinHash-LSH: band b's bucket is
    * xxhash64 of the band's signature slice salted with the band
    * index. Shared by [[minhashLsh]] and the decontamination arm
    * ([[Pipeline.fuzzyDecontaminate]]) — the two sides must produce
    * bit-identical buckets or candidate recall silently diverges.
    */
  private[llm] def bandBucketCols(sig: Column, bands: Int,
                                  rows: Int): Seq[Column] =
    (0 until bands).map { b =>
      xxhash64(((b * rows until (b + 1) * rows)
        .map(i => element_at(sig, i + 1))
        :+ lit(b.toLong)): _*)
    }

  /** Normalize text for fingerprinting: lowercase, collapse whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** THE content-identity key, shared by the batch dedup plane and the
    * streaming drain so the two can never diverge. Null text maps to a
    * non-null sentinel (not md5-hex-shaped, so it can't collide):
    * a null key would survive every `left_anti` equi-join against the
    * standing index — null-rejecting equality — and re-admit the same
    * null-text content every micro-batch.
    */
  def contentKey(text: Column): Column =
    coalesce(md5(normalized(text)), lit("__no_text__"))

  /** Exact dedup: hash-groupBy on normalized text. Returns one row per
    * distinct content with `dup_count` and the canonical (minimum) id.
    * At 100 TB this is a single hash aggregate on a 64-bit key — the
    * md5/xxhash key avoids shuffling full document bodies.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", contentKey(col(textCol)))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("canonical_id"),
           count(lit(1)).as("dup_count"))

  /** Spread a small or under-partitioned input across the cluster
    * before CPU-heavy per-row work. At scale inputs arrive with many
    * file splits and this is a no-op; a single-row-group parquet file
    * would otherwise pin the whole shingling stage to one task.
    * Partition count read from the physical plan (AQE-aware), not
    * `df.rdd` — materializing the RDD graph would freeze the plan and
    * bypass adaptive statistics.
    */
  private[llm] def rebalance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val nParts =
      try df.queryExecution.executedPlan.outputPartitioning.numPartitions
      catch { case scala.util.control.NonFatal(_) => 0 }
    if (nParts >= target) df else df.repartition(target)
  }

  /** Guard for the O(n²) brute-force oracle paths: refuse oversized
    * inputs instead of silently cross-joining a corpus. The extra
    * count() is one cheap pass — these paths exist for verification,
    * not production; use the bucketed variants at scale.
    */
  private def guardQuadratic(df: DataFrame, maxRows: Long, op: String): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"$op: input has $n rows > maxRows=$maxRows. This is the O(n²) " +
        "correctness-oracle path; use the bucketed variant (minhashLsh / " +
        "simhashPairs / embeddingNearDup) at scale, or raise maxRows explicitly.")
    df
  }

  /** Attach word n-gram shingles of `textCol` as array column `out`.
    * The word array is materialized as a named column first, so the
    * per-shingle lambda only slices an attribute reference — an inline
    * `split(...)` tree inside the lambda would re-tokenize the whole
    * document once per shingle element (O(words²) per document).
    */
  private[llm] def withShingles(df: DataFrame, textCol: String, n: Int,
                                out: String): DataFrame = {
    val w = col("__words")
    // n-grams by zipping n shifted slices of the word array: every
    // reference to `w` is row-level (evaluated once per row), and the
    // transform lambda touches only its own struct element. Slicing
    // `w` inside an index lambda instead would re-evaluate the word
    // array per element — O(words²) per document if an optimizer rule
    // (pushdown, CollapseProject) ever inlines the split() tree here.
    val g = greatest(size(w) - (n - 1), lit(0))
    val zipped = arrays_zip((0 until n).map(j => slice(w, lit(j + 1), g)): _*)
    df.withColumn("__words", split(normalized(col(textCol)), " "))
      .withColumn(out, array_distinct(transform(zipped, s =>
        concat_ws(" ", (0 until n).map(j => s.getField(j.toString)): _*))))
      .drop("__words")
  }

  /** MinHash signature over an ALREADY-HASHED shingle column
    * (array<long>): the k functions re-hash the fixed-width long with a
    * per-function salt, so signature cost is k cheap 16-byte hashes per
    * shingle instead of k variable-length string hashes.
    *
    * IMPORTANT: `hashedCol` must be a column REFERENCE (a withColumn
    * alias), not an inline expression — an expression tree pasted into
    * the k lambdas is duplicated per use and the string-hash pass runs
    * k times. (Wraparound multiply-add would be cheaper still, but
    * Spark 4 ANSI mode makes `*` overflow-checked.)
    */
  def minhashSignature(hashedCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(hashedCol, h => xxhash64(h, lit(i.toLong))))
    }: _*)

  /** Exact-duplicate pre-collapse for the pair-producing dedup
    * operators: docs with identical NORMALIZED text form one group
    * carried by a single representative (the minimum id). Candidate
    * generation and verification then run on representatives only — a
    * 32-way copy group costs one candidate row instead of 32 banded
    * rows and 496 verified pairs — and [[expandPairs]] restores the
    * full pair set afterwards. Lossless: identical normalized text ⇒
    * identical shingle/fingerprint sets ⇒ identical pair values, so
    * the expanded output equals the all-docs formulation row for row.
    * Returns one row per distinct content: (__rep, __ids ascending).
    *
    * No text column rides through the aggregate — a string-valued
    * min_by/first buffer is not hash-aggregable and would force
    * SortAggregate over the whole corpus; min(long) + collect_list is
    * one ObjectHashAggregate. [[collapseReps]] recovers the
    * representative ROWS with a shuffled-hash semi-join instead.
    */
  private[llm] def collapseExact(docs: DataFrame, idCol: String,
                                 textCol: String): DataFrame =
    rebalance(docs)
      .groupBy(md5(normalized(col(textCol))).as("__k"))
      .agg(min(col(idCol)).as("__rep"),
        sort_array(collect_list(col(idCol))).as("__ids"))
      .drop("__k")

  /** One full doc row per [[collapseExact]] group (the minimum-id
    * member). Sort-free: left-semi shuffled-hash join on the id.
    */
  private[llm] def collapseReps(docs: DataFrame, groups: DataFrame,
                                idCol: String): DataFrame =
    docs.join(
      groups.select(col("__rep").as(idCol)).hint("shuffle_hash"),
      Seq(idCol), "left_semi")

  /** [[collapseReps]] plus the group size as `__gs`: representative
    * rows weighted by how many exact copies they stand for. Corpus
    * statistics (distinct-doc counts per gram, corpus bigram counts)
    * computed over weighted representatives equal the all-docs
    * formulation exactly — identical text contributes identical gram
    * multisets, `__gs` times.
    */
  private[llm] def collapseRepsW(docs: DataFrame, groups: DataFrame,
                                 idCol: String): DataFrame =
    docs.join(
      groups.select(col("__rep").as(idCol),
        size(col("__ids")).cast("long").as("__gs")).hint("shuffle_hash"),
      Seq(idCol))

  /** Expand per-representative output rows back to one row per group
    * member. Valid whenever every payload column is a pure function of
    * document CONTENT and corpus-level statistics (identical text ⇒
    * identical value), which is exactly the collapse contract. One
    * shuffled-hash join + explode, linear in the output row count.
    */
  private[llm] def expandDocs(repOut: DataFrame, groups: DataFrame,
                              idCol: String,
                              payload: Seq[String]): DataFrame =
    repOut.join(
      groups.select(col("__rep").as(idCol), col("__ids"))
        .hint("shuffle_hash"), Seq(idCol))
      .select(explode(col("__ids")).as(idCol) +: payload.map(col): _*)

  /** Expand representative-level pairs back to all member pairs.
    * `repPairs` carries (id_a, id_b, payload…) over representative
    * ids; `withinEligible` carries (__rep, payload…) for groups whose
    * members pair with each other (identical content — e.g. jaccard
    * 1.0 when the shingle set is non-empty). Pair values are constant
    * across a group pair because every member shares the exact
    * shingle/fingerprint set; id_a < id_b is restored after expansion.
    * The explode work is linear in the OUTPUT pair count — the
    * quadratic candidate join never sees duplicate members.
    */
  private def expandPairs(repPairs: DataFrame, groups: DataFrame,
                          withinEligible: DataFrame,
                          payload: Seq[String]): DataFrame = {
    // shuffle_hash on the group side: groups is corpus-sized (one row
    // per distinct content) and must not broadcast; an unhinted join
    // would sort-merge it once AQE's broadcast threshold is exceeded
    val ga = groups.select(col("__rep").as("id_a"), col("__ids").as("__ia"))
    val gb = groups.select(col("__rep").as("id_b"), col("__ids").as("__ib"))
    val cross = repPairs
      .join(ga.hint("shuffle_hash"), Seq("id_a"))
      .join(gb.hint("shuffle_hash"), Seq("id_b"))
      .withColumn("__a", explode(col("__ia")))
      .withColumn("__b", explode(col("__ib")))
      .select(Seq(least(col("__a"), col("__b")).as("id_a"),
        greatest(col("__a"), col("__b")).as("id_b")) ++ payload.map(col): _*)
    val within = groups.filter(size(col("__ids")) > 1)
      .join(withinEligible.hint("shuffle_hash"), Seq("__rep"))
      .withColumn("__a", explode(col("__ids")))
      .withColumn("__b", explode(col("__ids")))
      .filter(col("__a") < col("__b"))
      .select(Seq(col("__a").as("id_a"), col("__b").as("id_b")) ++
        payload.map(col): _*)
    cross.unionByName(within)
  }

  /** MinHash-LSH candidate pairs: signatures split into `bands` bands of
    * `rows` rows; docs sharing any band bucket become candidates; then
    * exact n-gram Jaccard verifies. Returns pairs `(id_a, id_b, jaccard)`
    * with id_a < id_b and jaccard >= threshold.
    *
    * Scale path: exact duplicates collapse to one representative per
    * distinct content FIRST ([[collapseExact]]) — copy-heavy corpora
    * (the 100 TB reality) never inflate the banded set or the verify
    * join; the band explode then produces `bands` rows per distinct
    * doc; the self-join runs per-bucket (skew-safe with AQE); no full
    * cross join. Pairs expand back losslessly at the end.
    */
  def minhashLsh(docs: DataFrame, n: Int = 3, numHashes: Int = 128,
                 bands: Int = 32, threshold: Double = 0.5,
                 idCol: String = "doc_id", textCol: String = "text",
                 maxBucket: Int = 100000): DataFrame = {
    val (groups, repPairs, withinEligible) =
      minhashLshParts(docs, n, numHashes, bands, threshold, idCol, textCol,
        maxBucket)
    expandPairs(repPairs, groups, withinEligible, Seq("jaccard"))
  }

  /** The representative-level internals of [[minhashLsh]]: exact-dup
    * groups, verified near-dup pairs over representatives only, and the
    * within-group pairing eligibility. [[minhashLsh]] expands these to
    * the full member-level pair set; [[fuzzyClusters]] consumes them
    * directly so the quadratic expansion never materializes.
    */
  private[llm] def minhashLshParts(docs: DataFrame, n: Int, numHashes: Int,
                                   bands: Int, threshold: Double,
                                   idCol: String, textCol: String,
                                   maxBucket: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val rows = numHashes / bands
    // Catalyst does NOT dedupe common subplans across the consumers
    // below (groups feeds the rep semi-join AND the pair expansion's
    // two legs AND the within arm; sh feeds the signature pipeline AND
    // both sides of the verify join): persist the shared frames once —
    // all are bounded by DISTINCT content count, entries LRU-evict
    // (the round-2 zipGrids lesson applied to the dedup plane).
    import org.apache.spark.storage.StorageLevel
    val groups = collapseExact(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val reps = collapseReps(docs, groups, idCol)
    // No emptiness filter on `sh` — a `size(sh) > 0` predicate would
    // be pushed below the rebalance exchange, re-evaluating the whole
    // shingle pipeline single-task on the scan side. Shingle-less docs
    // share the degenerate all-MaxValue signature and can band
    // together, but the exact-jaccard verify discards those pairs
    // (0/0 = NULL fails every threshold) and the bucket cap bounds the
    // candidate blow-up. Shingles are hashed to 64-bit longs up front:
    // the signature, banding, and the exact-jaccard verify all work on
    // fixed-width longs (string set ≡ hash set modulo ~2^-64 collision).
    val sh = withShingles(rebalance(reps), textCol, n, "sh")
      .select(col(idCol).as("id"),
        transform(col("sh"), s => xxhash64(s)).as("shh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Signatures via the native minhash_sig expression: one fused loop
    // per row, bit-identical to the earlier explode + 64 min-aggregate
    // formulation (same XXH64 chain) but with no k× row amplification
    // and no signature shuffle — only the banded candidates move.
    // minhash_sig is a non-cheap alias, so CollapseProject will NOT
    // inline it into the per-band element_at references.
    val sig = sh.select(col("id"),
      call_function("minhash_sig", col("shh"), lit(numHashes)).as("__sig"))
    val banded0 = sig.select(col("id"),
        posexplode(array(bandBucketCols(col("__sig"), bands, rows): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // Bucket-size cap: one giant duplicate cluster would make a single
    // band bucket quadratic (k docs -> k²/2 candidate pairs). Buckets
    // over the cap are dropped from candidate generation — at that
    // cardinality the members are near-identical and belong to the
    // exact-dedup pre-pass (dd1), which collapses them in one hash agg.
    // The cap is a (band,bucket) HASH aggregate + shuffled-hash
    // semi-join, NOT count().over(Window.partitionBy(...)): the window
    // form forces Exchange → Sort → Window over the full banded set
    // (n_docs × bands rows), the same scale-killer shape as dd7's gram
    // windows. Sort-free here, and the candidate self-join below is
    // hinted shuffle_hash too, so no node in the pipeline ever sorts
    // the banded set (the cap bounds every build bucket). ONE exchange
    // feeds the whole candidate stage: repartition(band,bucket) up
    // front, then the cap aggregate, its semi-join, and the self-join
    // all run on that partitioning (exchange reuse).
    val banded1 = banded0.repartition(col("band"), col("bucket"))
    val smallBuckets = banded1.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket)
      .select("band", "bucket")
    val banded = banded1
      .join(smallBuckets.hint("shuffle_hash"), Seq("band", "bucket"),
        "left_semi")
    // candidates as id pairs ONLY — dedup before re-attaching the shingle
    // arrays, so the distinct shuffles 16 bytes/row, not whole documents
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cand = l.join(r.hint("shuffle_hash"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val shA = sh.select(col("id").as("id_a"), col("shh").as("sh_a"))
    val shB = sh.select(col("id").as("id_b"), col("shh").as("sh_b"))
    val repPairs = cand.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", try_divide(col("inter"), col("uni")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    // Within-group pairs are identical content: jaccard exactly 1.0,
    // eligible only when the shingle set is non-empty (two shingle-less
    // docs verify as NULL-jaccard in the pairwise form and must stay
    // excluded here too). Eligibility is word count ≥ n on the raw
    // text — NEVER a size() filter on the derived shingle array: a
    // predicate on a computed array column gets pushed below the
    // projections, inlining the whole shingle pipeline into the filter
    // (interpreted, O(words²) per row — the withShingles hazard).
    val withinEligible = reps
      .filter(size(split(normalized(col(textCol)), " ")) >= n)
      .select(col(idCol).as("__rep"), lit(1.0).as("jaccard"))
      .filter(lit(1.0) >= threshold)
    (groups, repPairs, withinEligible)
  }

  /** Exact n-gram Jaccard similarity over all pairs — the correctness
    * oracle for [[minhashLsh]]. O(n²): guarded, refuses oversized input.
    */
  def ngramJaccardAllPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           maxRows: Long = 10000): DataFrame = {
    val sh = withShingles(
        rebalance(guardQuadratic(docs, maxRows, "ngramJaccardAllPairs")),
        textCol, n, "sh")
      .select(col(idCol).as("id"), col("sh"))
    val l = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", try_divide(col("inter"), col("uni")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicates — the DEFAULT, scale-safe path:
    * multi-table random-hyperplane LSH (OR-amplification). Each of the
    * `tables` independent `bitsPerTable`-bit sign signatures buckets
    * the corpus; vectors sharing any table bucket become candidates;
    * exact cosine verifies. With p = 1 − θ/π the per-hyperplane
    * agreement probability, recall = 1 − (1 − p^b)^L — at cosine 0.95
    * (θ≈18°), b=16, L=24 gives ≈0.992 — while a random pair collides
    * with chance ≈ L/2^b ≈ 4e-4, so candidate volume stays near-linear.
    * Raise b (sharper buckets) for higher thresholds / bigger corpora;
    * raise L to buy recall back.
    */
  def embeddingNearDup(em: DataFrame, threshold: Double,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       bitsPerTable: Int = 16, tables: Int = 24): DataFrame = {
    val base = rebalance(em).select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.l2norm(col("v")))
    // candidate pairs as ids only; vectors re-attach after the distinct.
    // All table keys come from ONE fused lsh_keys pass (not tables×bits
    // separate vec_dot evals — see functions.LshKeys).
    val banded = base
      .select(col("id"), posexplode(
        call_function("lsh_keys", col("v"), lit(bitsPerTable), lit(tables))))
      .select(col("id"),
        xxhash64(col("pos").cast("long"), col("col")).as("ck"))
    val l = banded.select(col("ck"), col("id").as("id_a"))
    val r = banded.select(col("ck"), col("id").as("id_b"))
    val cand = l.join(r, Seq("ck")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = base.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val vb = base.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cosine",
        try_divide(Similarity.dot(col("v_a"), col("v_b")), col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Brute-force all-pairs embedding near-dup — the correctness oracle
    * for [[embeddingNearDup]]. O(n²): guarded, refuses oversized input.
    */
  def embeddingNearDupExact(em: DataFrame, threshold: Double,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            maxRows: Long = 10000): DataFrame = {
    val base = rebalance(guardQuadratic(em, maxRows, "embeddingNearDupExact"))
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.l2norm(col("v")))
    val l = base.select(col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("n_a"))
    val r = base.select(col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("n_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        try_divide(Similarity.dot(col("v_a"), col("v_b")), col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Connected components over an undirected edge list — the cluster
    * step of a fuzzy-dedup pipeline (near-dup PAIRS from
    * [[minhashLsh]] / [[simhashPairs]] / [[embeddingNearDup]] become
    * duplicate CLUSTERS with one canonical survivor each).
    *
    * Alternating large-star / small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): each round is two
    * groupBy-join passes that rewire every node toward the minimum id
    * in its neighborhood; the edge set converges to stars centered at
    * each component's minimum in O(log² n) rounds w.h.p. — no
    * O(diameter) label-propagation chains, no driver-side graph. Per
    * round the lineage is cut with localCheckpoint (the iterated plan
    * would otherwise grow exponentially); convergence is detected by
    * an order-independent (count, xor-hash) aggregate of the edge set.
    *
    * Returns `(id, component)` for every node appearing in `edges`,
    * where `component` is the minimum id of the node's component
    * (centers map to themselves).
    */
  def connectedComponents(edges0: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b",
                          maxIter: Int = 50): DataFrame = {
    // ids are packed into longs for the iteration; a string id would
    // cast to null (or throw under ANSI) and every edge would silently
    // vanish — refuse loudly instead. String-keyed corpora should
    // derive a numeric surrogate (e.g. xxhash64 + a collision check)
    // before clustering.
    for (c <- Seq(srcCol, dstCol)) {
      import org.apache.spark.sql.types._
      val ok = edges0.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"connectedComponents needs integral ids; $c is " +
        edges0.schema(c).dataType.simpleString)
    }
    val ini = edges0
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct()
    val nodes = ini.select(explode(array(col("u"), col("v"))).as("id")).distinct()

    // one star pass over a bidirectional adjacency: for every node u,
    // m = min(Γ(u) ∪ {u}); large-star rewires the strictly LARGER
    // neighbors to m, small-star the smaller-or-equal ones (keeping
    // u→m itself). Emitted edges always point high→low, so the
    // canonical (u > v) invariant is preserved without re-sorting.
    def star(edges: DataFrame, large: Boolean): DataFrame = {
      val bi = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = bi.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val j = bi.join(mins, "u")
      val out =
        if (large) j.filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
        else j.filter(col("v") <= col("u") && col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
          .unionAll(mins.filter(col("m") =!= col("u"))
            .select(col("u"), col("m").as("v")))
      out.filter(col("u") =!= col("v")).distinct()
    }

    // order-independent edge-set fingerprint: xor of per-edge hashes
    // (sum would overflow-throw under Spark 4 ANSI mode)
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var cur = ini.localCheckpoint(true)
    var curSig = sig(cur)
    var converged = cur.isEmpty
    var it = 0
    while (!converged && it < maxIter) {
      val next = star(star(cur, large = true), large = false)
        .localCheckpoint(true)
      val nextSig = sig(next)
      converged = nextSig == curSig && next.exceptAll(cur).isEmpty
      cur = next; curSig = nextSig; it += 1
    }
    if (!converged && it >= maxIter) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds")

    nodes.join(cur.select(col("u").as("id"), col("v").as("component")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
  }

  /** Fuzzy-dedup clustering: near-dup pairs → duplicate clusters.
    * Returns one row per multi-member cluster: the canonical id
    * (cluster minimum — the survivor a dedup pass keeps) and the
    * cluster size. Singletons (docs with no near-dup) are not emitted:
    * at corpus scale the pair list is tiny relative to the corpus and
    * the survivor set is `docs ANTI JOIN (members − canonicals)`.
    */
  def duplicateClusters(pairs: DataFrame, srcCol: String = "id_a",
                        dstCol: String = "id_b"): DataFrame =
    connectedComponents(pairs, srcCol, dstCol)
      .groupBy(col("component").as("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"))

  /** Fused minhash-LSH → duplicate clusters, skipping the member-level
    * pair expansion entirely. [[duplicateClusters]] over
    * [[minhashLsh]]'s output feeds connected components an edge set
    * QUADRATIC in exact-copy group size (a g-member copy group expands
    * to g(g−1)/2 within pairs, and a cross pair between groups A and B
    * to |A|·|B| edges) — at corpus scale one million-copy boilerplate
    * group is 5·10¹¹ edges. Here the edge set is the
    * connectivity-equivalent LINEAR one: verified representative-level
    * pairs plus one star edge per member of each pairing-eligible
    * multi-member group. Components, canonical ids (group minima) and
    * member counts are identical to the expanded formulation — a
    * member connects to everything its representative connects to via
    * the star, and cross-pair expansion connects exactly the same
    * member sets through the opposite group's members.
    *
    * Eligibility mirrors [[expandPairs]]: a group's members pair with
    * each other iff the within-group jaccard (exactly 1.0, on a
    * non-degenerate shingle set) passes — shingle-less copy groups
    * (fewer than n words) stay unclustered, as in the expanded form.
    * Representatives appearing in any verified cross pair are included
    * defensively; with threshold ≤ 1 they are always within-eligible
    * anyway (a verified pair needs a non-empty shingle set).
    */
  def fuzzyClusters(docs: DataFrame, n: Int = 3, numHashes: Int = 128,
                    bands: Int = 32, threshold: Double = 0.5,
                    idCol: String = "doc_id", textCol: String = "text",
                    maxBucket: Int = 100000): DataFrame = {
    val (groups, repPairs, withinEligible) =
      minhashLshParts(docs, n, numHashes, bands, threshold, idCol, textCol,
        maxBucket)
    // Iterate connected components ONLY on the representative-level
    // pair graph — near-dup pairs between DISTINCT contents, the tiny
    // core of the problem. Exact-copy members never enter the loop: a
    // member connects to the cluster exclusively through its
    // representative, so comp(member) = comp(rep), applied as one
    // post-convergence join; and because every representative is its
    // group's minimum id, the pair-graph component minimum IS the
    // member-level canonical id. Cluster size needs no member
    // explode either — it is the sum of group sizes per component.
    // repPairs feeds TWO actions (the CC materialization and the final
    // clustering aggregate); unpersisted, the second re-runs the whole
    // LSH candidate/verify pipeline
    val repPairsP = repPairs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val repComp = connectedComponents(repPairsP) // (id=rep, component)
    val pairedReps = repPairsP.select(col("id_a").as("__rep"))
      .unionAll(repPairsP.select(col("id_b").as("__rep")))
      .distinct()
    // a group's members cluster iff the group pairs within itself
    // (multi-member AND within-eligible: non-degenerate shingle set)
    // or its representative has any cross pair
    val flagged = groups
      .join(withinEligible.select(col("__rep"), lit(1).as("__we"))
        .hint("shuffle_hash"), Seq("__rep"), "left")
      .join(pairedReps.select(col("__rep"), lit(1).as("__pr"))
        .hint("shuffle_hash"), Seq("__rep"), "left")
      .filter(col("__pr").isNotNull ||
        (col("__we").isNotNull && size(col("__ids")) > 1))
    flagged
      .join(repComp.select(col("id").as("__rep"), col("component"))
        .hint("shuffle_hash"), Seq("__rep"), "left")
      .select(coalesce(col("component"), col("__rep")).as("canonical_id"),
        size(col("__ids")).cast("long").as("__n"))
      .groupBy("canonical_id")
      .agg(sum(col("__n")).as("cluster_size"))
  }

  /** SimHash (64-bit): sign of per-bit weighted sums of token hashes.
    * Near-dups = small Hamming distance. Computed with explode +
    * groupBy — one shuffle on doc id; the 64 bit-sums are a single
    * aggregate projection.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val toks = rebalance(docs).select(col(idCol).as("id"),
        explode(split(normalized(col(textCol)), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    // per-bit ONES counts (shift+mask, codegen'd) instead of ±1
    // conditionals: sign_b = (2·ones_b > n), identical tie behavior
    val aggs = (0 until 64).map { b =>
      sum(shiftrightunsigned(col("h"), b).bitwiseAND(lit(1L))).as(s"o$b")
    } :+ count(lit(1)).as("n")
    val agg = toks.groupBy("id").agg(aggs.head, aggs.tail.toSeq: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"o$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs within a Hamming radius, via the
    * anchor-combination pigeonhole: split the 64-bit signature into
    * `chunks` pieces; a pair within the radius differs in ≤ `radius`
    * pieces, so it AGREES on ≥ `chunks − radius` — therefore it shares
    * at least one exact (chunks−radius)-combination. Candidate join on
    * the hashed combination values, then exact Hamming filter via
    * bit_count(xor). Recall is 100% by construction (it is a lossless
    * candidate generator, not an approximation).
    *
    * Scale: with the defaults (radius 3, 8 chunks) each doc emits
    * C(8,5)=56 keys of 5×8=40 combined bits, so bucket cardinality is
    * ~n/2^40 — bounded even at billions of docs. The naive radius+1
    * chunking (4 chunks of 16 bits) would pigeonhole into only 2^16
    * buckets per chunk: O(n²/65k) candidate pairs at corpus scale.
    */
  def simhashPairs(docs: DataFrame, radius: Int = 3, chunks: Int = 0,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    simhashPairsOnSig(simhash(docs, idCol, textCol), radius, chunks)

  /** [[simhashPairs]] over precomputed `(id, simhash)` signatures —
    * callers that also need the signatures (e.g. a brute-force verify)
    * compute them once, cache, and share. */
  def simhashPairsOnSig(sig: DataFrame, radius: Int = 3,
                        chunks: Int = 0): DataFrame = {
    // auto: 8 chunks keeps combo count small for typical radii; larger
    // radii fall back to the naive radius+1 split (m=1) — C(r+1, 1)
    // keys — since C(8, 8−r) explodes past r≈5
    val nc = if (chunks > 0) chunks else if (radius <= 4) 8 else radius + 1
    require(nc > radius, s"need chunks ($nc) > radius ($radius)")
    require(nc <= 64, s"chunks ($nc) must be <= 64")
    val m = nc - radius
    val nKeys = (0 until nc).combinations(m).size
    require(nKeys <= 1024,
      s"C($nc, $m) = $nKeys combination keys per doc — reduce chunks or radius")
    // uneven split: the first (64 % nc) chunks get one extra bit
    val base = 64 / nc
    val rem = 64 % nc
    def chunkVal(c: Int) = {
      val start = c * base + math.min(c, rem)
      val width = base + (if (c < rem) 1 else 0)
      shiftrightunsigned(col("simhash"), start)
        .bitwiseAND(lit(if (width >= 64) -1L else (1L << width) - 1))
    }
    val keys = (0 until nc).combinations(m).toSeq.zipWithIndex.map {
      case (cmb, ci) => xxhash64((lit(ci.toLong) +: cmb.map(chunkVal)): _*)
    }
    val banded = sig.select(col("id"), col("simhash"),
      explode(array(keys: _*)).as("ck"))
    val l = banded.select(col("ck"), col("id").as("id_a"),
      col("simhash").as("sig_a"))
    val r = banded.select(col("ck"), col("id").as("id_b"),
      col("simhash").as("sig_b"))
    l.join(r, Seq("ck")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
  }

  /** Semantic dedup over an embedding column (SemDeDup, Abbas et al.
    * 2023, arXiv:2303.09540): cluster the corpus around deterministic
    * k-means centroids ([[Similarity.kmeansCentroids]]), then compare
    * pairs ONLY within a cluster — a vector is `dropped` when a
    * lower-id vector in the same cell has cosine ≥ `threshold` (the
    * witness with the highest cosine, min-id tiebreak, is recorded).
    * Chained drops keep the greedy-by-id semantics of [[exact]]: a
    * dropped vector's witness may itself be dropped; survivors are
    * exactly the rows with `dropped = false`.
    *
    * Scale shape: the quadratic work is Σ|cell|², bounded by growing
    * `nClusters` with the corpus (the SemDeDup design point — cells of
    * ~n/k vectors); the self-join shuffles both sides hash-partitioned
    * on `cell`, so each cell's pairwise pass is one local task. At
    * 100 TB write the corpus bucketed by `cell` once and the join
    * becomes co-located. Centroids are plan-time scalars trained on a
    * hash-sample; no RNG state anywhere, so the drop set is
    * reproducible run-to-run.
    */
  def semDedup(em: DataFrame, nClusters: Int = 8, threshold: Double = 0.8,
               iters: Int = 3, sampleMod: Int = 1,
               idCol: String = "vec_id",
               vecCol: String = "embedding",
               probes: Int = 2): DataFrame = {
    // witness selection negates ids arithmetically (max-struct tie
    // break); a string id would null out (or throw under ANSI) and
    // silently disable every drop — refuse loudly
    require(em.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"semDedup needs a numeric $idCol; got " +
        em.schema(idCol).dataType.simpleString)
    val cents = Similarity.kmeansCentroids(em, nClusters, iters, sampleMod,
      idCol, vecCol)
    // fused per-row cell assignment — the vector table never joins or
    // shuffles for its label (see functions.VecTopCells). Each vector
    // probes its top-`probes` cells (multi-assignment): single-cell
    // SemDeDup misses every near-dup pair a cluster boundary splits,
    // and at growing corpus size boundary pairs dominate the misses.
    // A pair sharing two probed cells yields duplicate candidate rows;
    // the max-struct witness aggregate collapses them.
    val labeled = rebalance(em).select(col(idCol), col(vecCol))
      .withColumn("__cells",
        transform(Similarity.topCells(col(vecCol), cents, probes),
          c => c.getField("cell")))
      .withColumn("__nrm", Similarity.l2norm(col(vecCol)))
    val base = labeled.withColumn("cell", explode(col("__cells")))
    val a = base.select(col("cell"), col(idCol).as("__ida"),
      col(vecCol).as("__va"), col("__nrm").as("__na"))
    val b = base.select(col("cell"), col(idCol).as("__idb"),
      col(vecCol).as("__vb"), col("__nrm").as("__nb"))
    val wit = a.join(b, Seq("cell"))
      .filter(col("__idb") < col("__ida"))
      .withColumn("__cos",
        try_divide(Similarity.dot(col("__va"), col("__vb")), col("__na") * col("__nb")))
      .filter(col("__cos") >= threshold)
      .groupBy(col("__ida").as(idCol))
      .agg(max(struct(col("__cos").as("c"), (-col("__idb")).as("negid")))
        .as("__w"))
      .select(col(idCol), col("__w.c").as("witness_cosine"),
        (-col("__w.negid")).cast("long").as("witness_id"))
    // output stays one row per vector, labeled by its PRIMARY cell.
    // shuffle_hash: the witness side is corpus-bounded (too big to
    // broadcast, no reason to SORT both sides for one equi-join)
    labeled.select(col(idCol), element_at(col("__cells"), 1).as("cell"))
      .join(wit.hint("shuffle_hash"), Seq(idCol), "left")
      .withColumn("dropped", col("witness_id").isNotNull)
  }

  /** Cross-document repeated-span detection (the n-gram form of exact
    * substring dedup, Lee et al. 2022 "Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499 §4.1): every
    * positional word `w`-gram is hashed; a gram occurring in ≥ 2
    * DISTINCT documents marks each of its occurrences as duplicated
    * text. Returns one row per document (with ≥ 1 gram): total gram
    * positions, positions covered by corpus-duplicated grams, and the
    * duplicated fraction — the signal a pipeline thresholds to drop or
    * trim boilerplate-heavy documents. Within-document repetition is
    * deliberately excluded (countDistinct doc), that's
    * [[TextAnalysis.repetitionSignals]]'s job.
    *
    * Scale shape: the expensive explode runs ONCE (Catalyst does not
    * dedupe shared subplans — a self-join formulation would re-shingle
    * the corpus per consumer); positions immediately collapse to
    * distinct (gram, doc) pairs with an occurrence count (map-side
    * partial agg, 24 bytes/row — never the gram text), a gram-
    * partitioned window counts sharing docs, and one final aggregate
    * rolls up per document. A boilerplate hot gram carries one row per
    * sharing DOC (not per occurrence) through the window — the
    * pre-aggregation is what bounds it.
    */
  /** Segment-level exact dedup (the paragraph-dedup shape of RefinedWeb/
    * Dolma-style pipelines, expressed over delimiter-free text as fixed
    * `segWords`-word segments): every distinct segment is kept exactly
    * once corpus-wide, at its lexicographically first occurrence
    * (min doc id, then min position within that doc); all other
    * occurrences are dropped and each document is reassembled from its
    * surviving segments in original order. Returns
    * `(id, n_kept, h = md5 of the reassembled text)`.
    *
    * Scale shape: one explode then ONE hash aggregate — grouping on the
    * segment's 64-bit hash, with the keeper found as `min(struct(id,
    * seg_idx, seg))` so the winning occurrence (and its text) falls out
    * of the same aggregate, no join back to the corpus. Map-side
    * partial `min` collapses a boilerplate segment to one row per input
    * partition before the exchange. The reassembly groupBy shuffles
    * only surviving segments.
    */
  def segmentDedup(docs: DataFrame, segWords: Int = 10,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(segWords > 0, s"segWords must be positive: $segWords")
    // the winner coordinate packs (id, seg_idx) into one decimal; a
    // non-numeric id would null the pack key and return ZERO rows
    // silently — refuse loudly (derive a numeric surrogate first).
    // Note on the output contract: a document whose EVERY segment
    // first occurs in a lower-id document has no surviving segments
    // and is absent from the result (the join is inner) — consumers
    // wanting an explicit n_kept=0 row should left-join from `docs`.
    require(docs.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"segmentDedup needs a numeric $idCol; got " +
        docs.schema(idCol).dataType.simpleString)
    // Segment TEXT never shuffles: the explode emits only the 64-bit
    // segment hash; the winner per distinct segment is min over the
    // (id, seg_idx) coordinate PACKED into one decimal — a mutable agg
    // buffer type, so the corpus-wide aggregate stays a codegen'd
    // HashAggregate (a min over struct(id, idx, seg) falls back to
    // sort-based aggregation and sorts the whole exploded set).
    // Winning coordinates roll up per doc and the surviving segments
    // are RE-SLICED from the source text at reassembly.
    val words = col("__words")
    val nSeg = ceil(size(words) / lit(segWords.toDouble)).cast("int")
    val packBase = 1L << 30 // up to 2^30 segments/doc, id up to ~10^27
    val segsH = rebalance(docs)
      .withColumn("__words", split(col(textCol), " "))
      .select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(1), greatest(nSeg, lit(1))), i =>
          xxhash64(concat_ws(" ",
            slice(words, (i - lit(1)) * segWords + lit(1), lit(segWords)))))))
      .select(col("col").as("__gh"),
        (col("id").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * packBase +
          (col("pos") + 1)).as("__p"))
    val winners = segsH
      .groupBy(col("__gh")).agg(min(col("__p")).as("__w"))
      .withColumn("__idx", (col("__w") % packBase).cast("long"))
      .select(((col("__w") - col("__idx")) / packBase).cast("long").as("id"),
        col("__idx"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("__idx"))).as("__idxs"))
    docs.select(col(idCol), col(textCol))
      .join(winners, col(idCol) === winners("id"))
      .withColumn("__words", split(col(textCol), " "))
      .select(col(idCol), size(col("__idxs")).as("n_kept").cast("long")
          .as("n_kept"),
        md5(array_join(transform(col("__idxs"), ix =>
          concat_ws(" ", slice(words,
            ((ix - 1) * segWords + 1).cast("int"), lit(segWords)))), " "))
          .as("h"))
  }

  /** Incremental dedup: drop from a new `batch` every document whose
    * normalized content already exists in `corpus` — the steady-state
    * ingestion form of [[exact]] (a new crawl lands against a standing
    * corpus; only genuinely new content survives).
    *
    * Scale shape: both sides reduce to distinct 64-bit content hashes
    * before the anti-join, so the shuffle moves 8-byte keys (plus the
    * surviving batch rows), never corpus bodies. The corpus side is a
    * map-side-combined `distinct`; at 100 TB the hash set is what a
    * real deployment would maintain as a standing index.
    */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val ch = corpus.select(xxhash64(normalized(col(textCol))).as("__ch")).distinct()
    batch
      .withColumn("__bh", xxhash64(normalized(col(textCol))))
      .join(ch, col("__bh") === col("__ch"), "left_anti")
      .drop("__bh")
  }

  /** [[incrementalDedup]] with the standing corpus index held as a
    * Bloom filter instead of an exact hash set — the 100 TB form: at
    * 10⁹ corpus hashes the exact set no longer broadcasts, but a ~1%
    * fpp Bloom filter (~1.2 GB) does, turning the batch-side probe
    * into a narrow per-row filter with NO shuffle or join at all
    * (functions.BloomContains). False positives drop a small fraction
    * of genuinely-new documents (never resurrect known ones) — the
    * standard trade for a dedup gate at this scale.
    *
    * `expectedItems < 0` sizes the filter with one count() pass; pass
    * the known corpus cardinality at scale to skip it. Deterministic:
    * the sketch's bit positions are a pure function of the keys, so
    * build order/partitioning never changes the kept set.
    */
  def incrementalDedupBloom(corpus: DataFrame, batch: DataFrame,
                            expectedItems: Long = -1L, fpp: Double = 0.01,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    val ch = corpus.select(xxhash64(normalized(col(textCol))).as("__h"))
    val n = if (expectedItems > 0) expectedItems else math.max(ch.count(), 1L)
    val bf = ch.stat.bloomFilter("__h", n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    batch.filter(!call_function("bloom_contains",
      xxhash64(normalized(col(textCol))), lit(bos.toByteArray)))
  }

  /** ExactSubstr-style span REMOVAL (Lee et al. 2022): every token
    * covered by a w-gram that occurs in ≥ 2 distinct documents is cut;
    * the survivors are reassembled in order. Complements
    * [[repeatedSpans]] (which only scores).
    *
    * Scale shape: (1) gram set — one map-side-combined count-distinct
    * per gram hash; only 64-bit hashes shuffle, never gram text;
    * (2) dup-gram positions rejoin the gram stream and collapse to one
    * sorted int array per affected document (bounded by that doc's
    * gram count); (3) the rebuild is the native `remove_spans` merged
    * pointer walk, O(words+starts) per doc, inside whole-stage codegen.
    * Documents with no duplicated gram skip steps 2–3 entirely (left
    * join, empty starts).
    */
  def removeRepeatedSpans(docs: DataFrame, w: Int = 5,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val words = col("__words")
    val g = greatest(size(words) - (w - 1), lit(0))
    val zipped = arrays_zip((0 until w).map(j =>
      slice(words, lit(j + 1), g)): _*)
    // Exact copies collapse first ([[collapseExact]]): grams stream,
    // position lists, and the native rebuild all run once per DISTINCT
    // content, and the output expands back per member at the end (the
    // cleaned text is a pure function of content + the corpus dup-gram
    // set). A gram's distinct-DOC count is the GROUP-SIZE-WEIGHTED sum
    // over the representatives that carry it — a gram appearing only
    // inside a 32-copy group still counts 32 docs, so the dup-gram set
    // is exactly the all-docs one.
    val groups = collapseExact(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = rebalance(collapseRepsW(docs, groups, idCol))
      .withColumn("__words", split(normalized(col(textCol)), " "))
    val grams = base
      .select(col(idCol), col("__gs"), posexplode(transform(zipped, s =>
        xxhash64(concat_ws(" ",
          (0 until w).map(j => s.getField(j.toString)): _*)))))
      .toDF(idCol, "__gs", "__pos", "gh")
    // ONE exchange of the gram stream: repartition(gh) up front, then
    // the (gh,rep) weight dedup, the gh-level weighted doc count, AND
    // the dup-gram semi-join all run on that partitioning without
    // further exchanges (HashPartitioning(gh) satisfies the (gh,id)
    // aggregate's clustering, the gh aggregate, and both join sides —
    // exchange reuse makes the two consumers read one shuffle). Never
    // count().over(Window.partitionBy(gh)), which forces Exchange(gh)
    // → Sort(gh) → Window over the whole (gram, doc) set; the
    // SHUFFLE_HASH hint keeps the semi-join sort-free too (the
    // dup-gram set is unbounded at corpus scale, so no broadcast, and
    // a sort-merge join would reintroduce the sort).
    val bygh = grams.repartition(col("gh"))
    val dupGrams = bygh
      .groupBy(col("gh"), col(idCol)).agg(first(col("__gs")).as("__gs"))
      .groupBy(col("gh")).agg(sum(col("__gs")).as("__nd"))
      .filter(col("__nd") >= 2)
      .select("gh")
    val dupStarts = bygh
      .join(dupGrams.hint("shuffle_hash"), Seq("gh"), "left_semi")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("__pos"))).as("__starts"))
    val repOut = base
      .join(dupStarts.hint("shuffle_hash"), Seq(idCol), "left")
      .withColumn("__r", call_function("remove_spans", col("__words"),
        coalesce(col("__starts"), lit(Array.empty[Int])), lit(w)))
      .select(col(idCol), col("__r.clean").as("clean"),
        col("__r.n_kept").as("n_kept"),
        (size(col("__words")) - col("__r.n_kept")).as("n_removed"))
    expandDocs(repOut, groups, idCol, Seq("clean", "n_kept", "n_removed"))
  }

  /** Fingerprint-overlap near-dup (the MOSS shape): candidate pairs are
    * documents sharing ≥ `minShared` winnowing fingerprints
    * ([[TextAnalysis.fingerprintSql]] selection). Winnowing guarantees
    * any shared run of ≥ k+window−1 words yields a shared fingerprint,
    * so overlap count is a span-coverage signal — cheaper than minhash
    * when fingerprints are already materialized for provenance.
    *
    * Scale shape: ids only through the fingerprint self-join (the LSH
    * candidate rule); per-fingerprint bucket size is ENFORCED ≤
    * `maxBucket` (like the band-bucket cap in [[minhashLsh]]) — one
    * boilerplate fingerprint (license header, nav bar) shared by k docs
    * would otherwise make a k²/2 quadratic bucket at corpus scale.
    * Over-cap fingerprints are dropped from candidate generation; their
    * members are near-identical boilerplate carriers that the exact /
    * minhash passes collapse. The cap is a hash aggregate + semi-join
    * (sort-free), not a window.
    */
  def fingerprintDup(docs: DataFrame, k: Int = 3, window: Int = 4,
                     minShared: Int = 2, idCol: String = "doc_id",
                     textCol: String = "text",
                     maxBucket: Int = 100000): DataFrame = {
    val groups = collapseExact(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reps = collapseReps(docs, groups, idCol)
    // One exchange for the whole candidate stage: repartition(f) up
    // front — the bucket-size cap aggregate, its semi-join, and the
    // self-join all key on f and run on that one partitioning
    // (exchange reuse feeds every consumer). Only the final
    // (id_a,id_b) pair aggregate shuffles again, with map-side combine
    // collapsing same-pair fingerprints inside each f-partition.
    val fpd = TextAnalysis.fingerprintSql(rebalance(reps), textCol, k, window)
      .select(col(idCol), split(col("winnow_fp"), ",").as("__fps"))
    val ex0 = fpd
      .select(col(idCol), explode(col("__fps")).as("f"))
      .repartition(col("f"))
    val smallF = ex0.groupBy(col("f"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket)
      .select("f")
    val ex = ex0.join(smallF.hint("shuffle_hash"), Seq("f"), "left_semi")
    val a = ex.select(col("f"), col(idCol).as("id_a"))
    val b = ex.select(col("f"), col(idCol).as("id_b"))
    val repPairs = a.join(b, "f")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    // Within-group pairs share EVERY fingerprint of their (identical)
    // content: shared = |fps| of the representative, gated on
    // minShared. Counted from the exploded stream (one aggregate on a
    // tiny id set) — NEVER size() on the derived __fps column: that
    // predicate/projection gets pushed below the winnow projections,
    // inlining the whole fingerprint pipeline into an interpreted
    // filter (the withShingles O(words²) hazard).
    val withinEligible = ex0.groupBy(col(idCol))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col(idCol).as("__rep"), col("shared"))
    expandPairs(repPairs, groups, withinEligible, Seq("shared"))
  }

  def repeatedSpans(docs: DataFrame, w: Int = 5, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val words = col("__words")
    val g = greatest(size(words) - (w - 1), lit(0))
    val zipped = arrays_zip((0 until w).map(j =>
      slice(words, lit(j + 1), g)): _*)
    // ONE exchange of the gram stream (same shape as
    // [[removeRepeatedSpans]]): repartition(gh), then the (gh,doc)
    // occurrence aggregate, the gh-level distinct-doc count, and the
    // dup-gram join all run on that partitioning with no further
    // exchanges. Never count().over(Window.partitionBy(gh)) — that
    // forces Exchange(gh) → Sort(gh) → Window over the entire
    // (gram, doc) pair set, the dominant cost at corpus scale. The
    // SHUFFLE_HASH hint keeps the join back sort-free too (the
    // dup-gram set is unbounded — one per boilerplate phrase — so it
    // must not be broadcast, and a sort-merge join would reintroduce
    // the sort).
    // Exact copies collapse to weighted representatives first (same
    // shape as [[removeRepeatedSpans]]): the gram stream shrinks by
    // the copy factor, and a gram's distinct-doc count is the
    // group-size-weighted sum over representatives, so the dup-gram
    // set equals the all-docs formulation. Per-doc scores are pure
    // content functions and expand back per member.
    val groups = collapseExact(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bygh = rebalance(collapseRepsW(docs, groups, idCol))
      .withColumn("__words", split(normalized(col(textCol)), " "))
      .select(col(idCol), col("__gs"), explode(transform(zipped, s =>
        xxhash64(concat_ws(" ",
          (0 until w).map(j => s.getField(j.toString)): _*)))).as("gh"))
      .repartition(col("gh"))
    val perGramDoc = bygh
      .groupBy(col("gh"), col(idCol))
      .agg(count(lit(1)).as("__occ"), first(col("__gs")).as("__gs"))
    val dupGrams = perGramDoc.groupBy(col("gh"))
      .agg(sum(col("__gs")).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("gh"), lit(1L).as("__dup"))
    val repOut = perGramDoc
      .join(dupGrams.hint("shuffle_hash"), Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("__occ")).as("n_grams"),
        sum(when(col("__dup").isNotNull, col("__occ")).otherwise(0L))
          .as("n_dup_grams"))
      .withColumn("dup_frac", col("n_dup_grams") / col("n_grams"))
    expandDocs(repOut, groups, idCol,
      Seq("n_grams", "n_dup_grams", "dup_frac"))
  }
}
