package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  * Operators work on `array<double>` vectors — cast a raw
  * `array<float>` parquet column once at the pipeline entry
  * (`.cast("array<double>")`, as every gated query does); the
  * driver-side centroid/codebook collects normalize defensively.
  * Vector math is the native [[graft.functions.VecDot]] expression —
  * codegen'd, no UDFs.
  */
object Similarity {

  /** Dot product of two `array<double>` columns — the native
    * [[graft.functions.VecDot]] expression (one fused JVM loop inside
    * codegen; the zip_with/aggregate HOF form interprets a lambda per
    * element, billions of frames in ANN bucketing passes). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def l2norm(a: Column): Column = sqrt(call_function("vec_dot", a, a))

  /** Cosine similarity; a zero-norm (degenerate) vector yields NULL —
    * SQL division semantics (DuckDB oracle, pre-ANSI Spark), where a
    * bare `/` under ANSI (the Spark 4 default) would instead abort the
    * whole job on the first zero norm. */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: every query row against every corpus row.
    * Queries are broadcast (small side); corpus scan is embarrassingly
    * parallel; per-query top-k via window rank — one shuffle on query id.
    * This is the exact baseline the ANN variants are checked against.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // norms are per-row invariants: computed once per side before the
    // join (sqrt(v·v), the identical double cosine() would produce),
    // the pair loop is one vec_dot + a multiply instead of three dots
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      l2norm(col(vecCol)).as("__cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", try_divide(dot(col("qv"), col("cv")),
        col("__qn") * col("__cn")))
    topK(scored, k)
  }

  /** Per-query top-k by cosine: the ONE rank/tiebreak/output contract
    * every variant (brute force, IVF, LSH, index probes) shares — the
    * ANN arms are gated against the brute-force oracle, so the
    * tiebreak (`cosine` desc, corpus id asc) and column set must never
    * drift between them. `scored` needs (query_id, <corpusIdCol>,
    * cosine). */
  private def topK(scored: DataFrame, k: Int,
                   corpusIdCol: String = "corpus_id"): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(corpusIdCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(corpusIdCol).as("corpus_id"),
        col("cosine"), col("rank"))
  }

  /** Deterministic k-means centroids for [[ivfTopK]]: init from the
    * `nlist` corpus vectors with the smallest xxhash64(id) (a
    * pseudo-random but reproducible sample — no RNG state), then
    * `iters` Lloyd iterations. Each iteration is one broadcast-join
    * assignment pass plus a (cell, dim) aggregation; centroids
    * themselves are plan-time scalars (nlist × dim doubles). At 100 TB
    * train on a hash-sample of the corpus via `sampleMod` (keep ids
    * with xxhash64(id) % sampleMod == 0) — k-means quality needs only
    * a representative sample, not the full corpus.
    */
  def kmeansCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
                      sampleMod: Int = 1,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      seedSample: Int = 8192): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val train0 = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val train = (if (sampleMod > 1)
      train0.filter(pmod(xxhash64(col("cid")), lit(sampleMod.toLong)) === 0)
    else train0).cache()
    try {
    // deterministic farthest-point (k-center greedy) seeding: first
    // seed = min-hash row, each next seed the point least similar to
    // every chosen one (hash tiebreak). Unlike a pure hash sample this
    // cannot put two seeds inside one tight cluster, so Lloyd starts
    // from spread-out cells — the classic k-means++ motivation without
    // RNG state. The greedy runs DRIVER-SIDE over the `seedSample`
    // lowest-xxhash64 vectors: one TakeOrdered pass over the (sampled)
    // train set + k·|sample|·dim local flops, instead of k sequential
    // full scans. Whenever the corpus fits in the sample the result is
    // bit-identical to the distributed greedy (same summation order,
    // same (maxCosine, hash) argmin tiebreak).
    val sample0: Array[(Long, Seq[Double])] = train
      .withColumn("__h", xxhash64(col("cid")))
      .orderBy("__h").limit(seedSample)
      // normalize to double BEFORE collecting: float-array input would
      // otherwise surface as boxed Floats behind the Seq[Double] cast
      // and crash the first multiply (cast is a no-op for double input)
      .select(col("__h"), col("cv").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    // zero-norm vectors are SEED POISON under the max-min-cosine
    // greedy: their cosine to everything is NaN, so their running max
    // never rises above the -2 sentinel and the greedy would pick them
    // FIRST — wasting cells on centroids no vector can ever be
    // assigned to (NaN cosine loses every argmax). Drop them from the
    // seed pool; they still participate in Lloyd assignment (where
    // they land nowhere, matching the reference's degenerate-vector
    // behavior). Keep the raw sample only if everything is zero-norm.
    val sample: Array[(Long, Seq[Double])] = {
      val nonZero = sample0.filter { case (_, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        s > 0.0
      }
      if (nonZero.nonEmpty) nonZero else sample0
    }
    require(sample.nonEmpty,
      "kmeansCentroids: empty training sample — the corpus is empty" +
        (if (sampleMod > 1) s" or sampleMod=$sampleMod filtered every row"
         else ""))
    def dotL(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cosL(a: Seq[Double], b: Seq[Double]): Double =
      dotL(a, b) / (math.sqrt(dotL(a, a)) * math.sqrt(dotL(b, b)))
    var cents: Array[Seq[Double]] = sample.headOption.map(_._2).toArray
    if (cents.nonEmpty) {
      val maxc = Array.fill(sample.length)(-2.0)
      // explicit picked-tracking: "cos(self) = 1 prevents re-picking"
      // breaks for a zero-norm vector (cosL = NaN, maxc stuck at the
      // -2.0 sentinel → the same index would seed every remaining cell)
      val picked = Array.fill(sample.length)(false)
      picked(0) = true
      while (cents.length < nlist) {
        val newest = cents.last
        var best = -1
        var bestC = Double.MaxValue
        var bestH = Long.MaxValue
        var i = 0
        while (i < sample.length) {
          val c = cosL(sample(i)._2, newest)
          if (c > maxc(i)) maxc(i) = c
          if (!picked(i) && (best < 0 || maxc(i) < bestC ||
              (maxc(i) == bestC && sample(i)._1 < bestH))) {
            best = i; bestC = maxc(i); bestH = sample(i)._1
          }
          i += 1
        }
        if (best < 0) {
          // every sample row is already a seed: duplicate the head
          // rather than loop forever (nlist > distinct sample size)
          cents = cents :+ sample(0)._2
        } else {
          picked(best) = true
          cents = cents :+ sample(best)._2
        }
      }
    }
    def centDf = cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("cell", "centroid")
    for (_ <- 0 until iters) {
      // fused per-vector argmax (VecTopCells) — a narrow projection,
      // no crossJoin amplification, no per-vector shuffle; pick order
      // identical to the old (cdist desc, cell asc) formulations
      val assigned = train
        .withColumn("__tc", element_at(topCellsLocal(col("cv"),
          cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq, 1), 1))
        .select(col("__tc.cell").as("cell"), col("cv"))
      val means = assigned.select(col("cell"), posexplode(col("cv")))
        .groupBy("cell", "pos").agg(avg("col").as("m"))
        .collect().groupBy(_.getInt(0))
      cents = Array.tabulate(nlist) { cell =>
        means.get(cell)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
          .getOrElse(cents(cell)) // empty cell keeps its old centroid
      }
    }
      centDf
    } finally train.unpersist() // also on the empty-sample throw path
  }

  /** K-means cluster assignment as a first-class operator: every
    * corpus vector labeled with its nearest [[kmeansCentroids]] cell
    * (cosine) and the similarity to that centroid. This is the
    * embedding-clustering step of a training-data pipeline (topic
    * bucketing, stratified sampling, per-cluster quotas) and the build
    * side of the IVF index — at 100 TB, write the corpus partitioned
    * by `cell` and both use cases become partition-pruned scans. One
    * broadcast join + one window per vector; centroids are plan-time
    * scalars trained on a hash-sample (`sampleMod`).
    */
  def kmeansAssign(corpus: DataFrame, nlist: Int, iters: Int = 3,
                   sampleMod: Int = 1,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame =
    kmeansAssignWith(corpus,
      kmeansCentroids(corpus, nlist, iters, sampleMod, idCol, vecCol),
      idCol, vecCol)

  /** [[kmeansAssign]] against an already-trained `(cell, centroid)`
    * table — callers needing both centroids and assignments (IVF index
    * build, the cl1 argmax self-check) train once and reuse. */
  def kmeansAssignWith(corpus: DataFrame, centroids: DataFrame,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    // fused argmax (functions.VecTopCells): one narrow projection per
    // vector against the plan-time centroid matrix — no crossJoin row
    // amplification, no shuffle at all. (cosine desc, cell asc) pick
    // identical to the old (cdist, -cell) max-aggregate formulation
    // (cl1 pins the equivalence against an explicit window argmax).
    val tc = element_at(topCells(col(vecCol), centroids, 1), 1)
    corpus.withColumn("__tc", tc)
      .select(col(idCol), col("__tc.cell").as("cell"),
        col("__tc.cosine").as("centroid_cosine"))
  }

  /** The `n` nearest cells of `vec` by cosine as a fused per-row
    * Column — `array<struct<cell,cosine>>` ordered (cosine desc, cell
    * asc). Collects the (plan-time-sized) centroid table into an
    * expression-embedded matrix; see [[graft.functions.VecTopCells]].
    */
  def topCells(vec: Column, centroids: DataFrame, n: Int): Column =
    topCellsLocal(vec,
      centroids.select(col("cell").cast("int"),
          col("centroid").cast("array<double>"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq, n)

  private[graft] def topCellsLocal(vec: Column,
                                 cents: Seq[(Int, Seq[Double])],
                                 n: Int): Column =
    call_function("vec_top_cells", vec, typedlit(cents), lit(n))

  /** Persist an IVF index: `centroids/` (nlist small rows) plus
    * `cells/` — the corpus partitioned by its nearest cell on disk.
    * Build once, probe many: the materialized form of [[ivfTopK]]'s
    * in-plan assignment, and the layout that makes a 100 TB probe a
    * partition-pruned scan instead of a full pass.
    */
  def writeIvfIndex(corpus: DataFrame, path: String, nlist: Int = 16,
                    iters: Int = 3, idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit = {
    val centroids = kmeansCentroids(corpus, nlist, iters,
      idCol = idCol, vecCol = vecCol)
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    corpus.select(col(idCol), col(vecCol),
        explode(topCells(col(vecCol), centroids, 1)).as("__tc"))
      .select(col(idCol), col(vecCol), col("__tc.cell").as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/cells")
  }

  /** Probe a persisted IVF index: the tiny centroid table picks the
    * `nprobe` nearest cells per query; the broadcast cell join then
    * DYNAMICALLY PRUNES the `cells/` partitioned scan (Spark DPP
    * inserts the partition filter at runtime), so only
    * ~nprobe/nlist of the index bytes are read — the probe cost is
    * independent of corpus size for a fixed cell width.
    */
  def probeIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int, nprobe: Int = 4,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val probed = queries
      .select(col(idCol), col(vecCol),
        explode(topCells(col(vecCol), centroids, nprobe)).as("__tc"))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col("__tc.cell").as("cell"), l2norm(col(vecCol)).as("__qn"))
    val cells = spark.read.parquet(s"$path/cells")
      .withColumn("__cn", l2norm(col(vecCol)))
    val scored = cells.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col(idCol))
      .withColumn("cosine", try_divide(dot(col("qv"), col(vecCol)),
        col("__qn") * col("__cn")))
    topK(scored, k, corpusIdCol = idCol)
  }

  /** IVF-style ANN: partition the corpus into `nlist` cells around
    * deterministic k-means centroids ([[kmeansCentroids]]); a query
    * probes only the `nprobe` nearest cells. At 100 TB the corpus is
    * bucketed by `cell` on disk so a probe is a partition-pruned scan,
    * not a full pass.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = kmeansCentroids(corpus, nlist, iters,
      idCol = idCol, vecCol = vecCol)

    // fused per-row top-n cells (VecTopCells) — no crossJoin, no
    // shuffle; ordering identical to the old (cdist desc, cell asc)
    // window / max-aggregate picks
    def nearestCells(df: DataFrame, vc: String, n: Int, out: String): DataFrame =
      df.select(col(idCol), col(vc),
          explode(topCells(col(vc), centroids, n)).as("__tc"))
        .select(col(idCol), col(vc), col("__tc.cell").as(out))

    // per-row norms hoisted out of the per-(query,corpus) scoring loop
    val assigned = nearestCells(
      corpus.select(col(idCol), col(vecCol)), vecCol, 1, "cell")
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cv"), col("cell"),
        l2norm(col(vecCol)).as("__cn"))
    val probed = nearestCells(
      queries.select(col(idCol), col(vecCol)), vecCol, nprobe, "cell")
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"),
        l2norm(col(vecCol)).as("__qn"))

    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", try_divide(dot(col("qv"), col("cv")),
        col("__qn") * col("__cn")))
    topK(scored, k)
  }

  /** Persist an LSH index: `postings/` — (id, bucket-key) pairs
    * partitioned by the 64-bit bucket key (one directory per non-empty
    * bucket, ≤ tables·2^bits) — plus `vectors/` for the re-rank and a
    * one-row `params/` table pinning (bitsPerTable, tables) so probes
    * can never hash with mismatched parameters. Vectors are NOT
    * duplicated per table: postings carry ids only.
    */
  /** Postings land in a BOUNDED number of partition directories
    * (`ckp = pmod(ck, 256)`), not one per distinct bucket key: a
    * per-ck layout means every write task sprays up to tables·2^bits
    * directories (tasks × buckets small files — 8k at the local bench,
    * 64k+ per build on a real cluster), and the directory count grows
    * with the hash parameters. 256 dirs is parameter-independent; the
    * lost per-dir selectivity is recovered inside the files by sorting
    * on ck (parquet row-group min/max stats) — see probeLshIndex.
    */
  private val NumPostingParts = 256L

  def writeLshIndex(corpus: DataFrame, path: String,
                    bitsPerTable: Int = 8, tables: Int = 16,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol), col(vecCol))
      .write.mode("overwrite").parquet(s"$path/vectors")
    Seq((bitsPerTable, tables)).toDF("bits", "tables")
      .write.mode("overwrite").parquet(s"$path/params")
    corpus.select(col(idCol), posexplode(
        call_function("lsh_keys", col(vecCol), lit(bitsPerTable),
          lit(tables))))
      .select(col(idCol), xxhash64(col("pos").cast("long"), col("col"))
        .as("ck"))
      .withColumn("ckp", pmod(col("ck"), lit(NumPostingParts)))
      // one id+hash shuffle so each directory receives ONE file per
      // owning task instead of one per input task
      .repartition(col("ckp"))
      .sortWithinPartitions("ck")
      .write.partitionBy("ckp").mode("overwrite").parquet(s"$path/postings")
  }

  /** Probe a persisted LSH index: queries hash with the index's pinned
    * parameters. For bounded query batches the probed bucket keys
    * become LITERAL `isin` predicates — partition pruning on ckp plus
    * row-group pruning on the sorted ck reach the parquet scan as
    * PushedFilters, so the read is ~tables·n/2^bits rows per query,
    * independent of corpus size. Oversized batches skip the literal
    * step and keep the broadcast-join path (still partition-prunable
    * via DPP). Candidate ids dedup before vectors re-attach for the
    * exact re-rank.
    */
  def probeLshIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val p = spark.read.parquet(s"$path/params").head()
    val (bits, tables) = (p.getInt(0), p.getInt(1))
    val probed = queries
      .select(col(idCol).as("query_id"), posexplode(
        call_function("lsh_keys", col(vecCol), lit(bits), lit(tables))))
      .select(col("query_id"),
        xxhash64(col("pos").cast("long"), col("col")).as("ck"))
      // carry the partition key so the bucket join ALSO matches on ckp:
      // that's what lets dynamic partition pruning fire on the
      // oversized-batch path (a ck-only join never prunes directories)
      .withColumn("ckp", pmod(col("ck"), lit(NumPostingParts)))
    // the probe side is broadcast-sized by contract: its distinct
    // bucket keys become driver-side literals for the scan pushdown
    // (the attribution join below still uses the frame)
    val cks = probed.select("ck").distinct().collect().map(_.getLong(0))
    val postings0 = spark.read.parquet(s"$path/postings")
    val postings =
      if (cks.length <= 8192)
        postings0.filter(
          col("ckp").isin(cks.map(Math.floorMod(_, NumPostingParts))
            .distinct.toSeq: _*) &&
          col("ck").isin(cks.toSeq: _*))
      else postings0
    val cand = postings
      .join(broadcast(probed), Seq("ckp", "ck"))
      .filter(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("corpus_id")).distinct()
    val cv = spark.read.parquet(s"$path/vectors")
      .select(col(idCol).as("corpus_id"), col(vecCol).as("corpus_v"))
    val qv = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
    val scored = cand.join(cv, Seq("corpus_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", cosine(col("query_v"), col("corpus_v")))
    topK(scored, k)
  }

  /** LSH-bucketed ANN: corpus and queries are hashed into `tables`
    * independent random-hyperplane bucket tables of `bitsPerTable` sign
    * bits each (OR-amplification); a query compares only against corpus
    * vectors sharing a bucket in ANY table, then exact cosine re-ranks.
    * Recall for a neighbor at angle θ is 1 − (1 − (1−θ/π)^b)^L — tune
    * b up for selectivity (bucket size ~ n/2^b per table), L up for
    * recall. At 100 TB the corpus is written bucketed by table key so a
    * probe is a bucket-pruned scan of L·n/2^b vectors per query. (The
    * previous single-table chunk-share scheme pigeonholed into 2^4
    * buckets per chunk — unbounded bucket cardinality at corpus scale.)
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bitsPerTable: Int = 8, tables: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def keyed(df: DataFrame, role: String): DataFrame =
      df.select(col(idCol).as(s"${role}_id"), col(vecCol).as("__v"))
        .select(col(s"${role}_id"), posexplode(
          call_function("lsh_keys", col("__v"),
            lit(bitsPerTable), lit(tables))))
        .select(col(s"${role}_id"),
          xxhash64(col("pos").cast("long"), col("col")).as("ck"))
    // candidate pairs as ids only — the distinct shuffles 16 bytes/row,
    // not embedding vectors; vectors re-attach after dedup
    val cand = keyed(corpus, "corpus")
      .join(broadcast(keyed(queries, "query")), Seq("ck"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id").distinct()
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("corpus_v"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
    val scored = cand.join(cv, Seq("corpus_id")).join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", cosine(col("query_v"), col("corpus_v")))
    topK(scored, k)
  }

  /** Hyperplane weight ±1 from the parity of xxhash64(seed, bit, dim):
    * computed AT PLAN TIME with the same XXH64 chain Catalyst's
    * xxhash64(lit(seed), lit(b), i) evaluates (seed 42, one hashInt per
    * argument), so the buckets are bit-identical to the expression form
    * — but the per-row cost drops from O(nbits·dim) hash evaluations to
    * a literal-array dot product, and the codegen tree stays small.
    */
  private def hyperplane(seed: Int, b: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val h = XXH64.hashInt(i,
        XXH64.hashInt(b, XXH64.hashInt(seed, 42L)))
      if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0 // pmod parity
    }

  /** Random-hyperplane LSH bucketing for cosine: `nbits` signs of dot
    * products with pseudo-random hyperplanes (deterministic from the
    * dimension index via a hash-derived ±1 pattern — no RNG state).
    * Candidates share a bucket; exact cosine re-ranks. `seed` selects
    * an independent hyperplane family (for multi-table
    * OR-amplification in [[lshTopK]] / [[Dedup.embeddingNearDup]]).
    * The embedding width is derived per-row by the native kernel.
    */
  def lshBuckets(df: DataFrame, nbits: Int = 16,
                 vecCol: String = "embedding", seed: Int = 0): DataFrame =
    // table index == hyperplane-family seed, so the fused kernel's
    // element (seed+1) is exactly lshBucketCol(vec, nbits, seed, dim).
    // The kernel computes tables 1..seed+1 in one pass, so a LOOP over
    // seeds is O(L^2/2) signature work — multi-table callers must call
    // lsh_keys(vec, nbits, L) once (or lshBucketCol per table) instead;
    // this door is for the common single-table (seed=0) case, where
    // the kernel cost is exactly one table.
    df.withColumn("lsh_bucket", element_at(
      call_function("lsh_keys", col(vecCol), lit(nbits), lit(seed + 1)),
      seed + 1))

  /** The bucket signature as a bare Column — multi-table callers build
    * all tables in ONE projection instead of chained withColumns. */
  def lshBucketCol(vec: Column, nbits: Int, seed: Int, dim: Int): Column =
    (0 until nbits).map { b =>
      val proj = call_function("vec_dot", vec,
        typedlit(hyperplane(seed, b, dim)))
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
}
