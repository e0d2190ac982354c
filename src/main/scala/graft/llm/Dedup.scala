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

  /** Normalize text for fingerprinting: lowercase, collapse whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact dedup: hash-groupBy on normalized text. Returns one row per
    * distinct content with `dup_count` and the canonical (minimum) id.
    * At 100 TB this is a single hash aggregate on a 64-bit key — the
    * md5/xxhash key avoids shuffling full document bodies.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", md5(normalized(col(textCol))))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("canonical_id"),
           count(lit(1)).as("dup_count"))

  /** Spread a small or under-partitioned input across the cluster
    * before CPU-heavy per-row work. At scale inputs arrive with many
    * file splits and this is a no-op; a single-row-group parquet file
    * would otherwise pin the whole shingling stage to one task.
    */
  private[llm] def rebalance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Attach word n-gram shingles of `textCol` as array column `out`.
    * The word array is materialized as a named column first, so the
    * per-shingle lambda only slices an attribute reference — an inline
    * `split(...)` tree inside the lambda would re-tokenize the whole
    * document once per shingle element (O(words²) per document).
    */
  private def withShingles(df: DataFrame, textCol: String, n: Int,
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

  /** MinHash-LSH candidate pairs: signatures split into `bands` bands of
    * `rows` rows; docs sharing any band bucket become candidates; then
    * exact n-gram Jaccard verifies. Returns pairs `(id_a, id_b, jaccard)`
    * with id_a < id_b and jaccard >= threshold.
    *
    * Scale path: the band explode produces `bands` rows per doc; the
    * self-join runs per-bucket (skew-safe with AQE); no full cross join.
    */
  def minhashLsh(docs: DataFrame, n: Int = 3, numHashes: Int = 128,
                 bands: Int = 32, threshold: Double = 0.5,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rows = numHashes / bands
    // No emptiness filter on `sh`: docs with no shingles emit no rows
    // from the explode and can never join as candidates — and a
    // `size(sh) > 0` predicate would be pushed below the rebalance
    // exchange, re-evaluating the whole shingle pipeline single-task
    // on the scan side. Shingles are hashed to 64-bit longs up front:
    // the signature, banding, and the exact-jaccard verify all work on
    // fixed-width longs (string set ≡ hash set modulo ~2^-64 collision).
    val sh = withShingles(rebalance(docs), textCol, n, "sh")
      .select(col(idCol).as("id"),
        transform(col("sh"), s => xxhash64(s)).as("shh"))
    // Signature via explode + groupBy rather than per-row array
    // lambdas: the k minima become codegen'd `min` aggregates in one
    // HashAggregate (partial map-side combine, then a k-long-wide
    // shuffle keyed on id), where `transform` lambdas are interpreted
    // per element. Shingles are distinct, so explode preserves set
    // semantics.
    val hashed = sh.select(col("id"), explode(col("shh")).as("h"))
    val minAggs = (0 until numHashes).map(i =>
      min(xxhash64(col("h"), lit(i.toLong))).as(s"m$i"))
    val sig = hashed.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until bands).map { b =>
      xxhash64(((b * rows until (b + 1) * rows).map(i => col(s"m$i"))
        :+ lit(b.toLong)): _*)
    }
    val banded = sig.select(col("id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // candidates as id pairs ONLY — dedup before re-attaching the shingle
    // arrays, so the distinct shuffles 16 bytes/row, not whole documents
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val shA = sh.select(col("id").as("id_a"), col("shh").as("sh_a"))
    val shB = sh.select(col("id").as("id_b"), col("shh").as("sh_b"))
    cand.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard similarity for given candidate id pairs
    * (brute-force variant over all pairs — correctness oracle for LSH).
    */
  def ngramJaccardAllPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val sh = withShingles(rebalance(docs), textCol, n, "sh")
      .select(col(idCol).as("id"), col("sh"))
    val l = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicates: pairs of vectors with cosine
    * similarity >= `threshold`. Norms are precomputed per row so the
    * pair stage only evaluates the dot product. Brute-force all-pairs
    * — the correctness path; at scale, bucket candidates first with
    * [[Similarity.lshBuckets]] (random-hyperplane LSH) and apply the
    * same verify to bucket-mates only.
    */
  def embeddingNearDup(em: DataFrame, threshold: Double,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val base = rebalance(em).select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", Similarity.l2norm(col("v")))
    val l = base.select(col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("n_a"))
    val r = base.select(col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("n_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
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

  /** SimHash near-dup pairs within a Hamming radius, using the
    * pigeonhole trick: split the 64-bit signature into `radius + 1`
    * chunks — any pair within the radius shares at least one exact
    * chunk → candidate join on (chunk index, chunk value), then exact
    * Hamming filter via bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, radius: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val chunks = radius + 1
    val bitsPer = 64 / chunks
    val sig = simhash(docs, idCol, textCol)
    val banded = sig.select(col("id"), col("simhash"),
      posexplode(array((0 until chunks).map { c =>
        shiftrightunsigned(col("simhash"), c * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1))
      }: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ck")
    val l = banded.select(col("chunk"), col("ck"),
      col("id").as("id_a"), col("simhash").as("sig_a"))
    val r = banded.select(col("chunk"), col("ck"),
      col("id").as("id_b"), col("simhash").as("sig_b"))
    l.join(r, Seq("chunk", "ck")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
  }
}
