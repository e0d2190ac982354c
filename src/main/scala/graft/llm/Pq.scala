package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization for ANN at corpus scale (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", IEEE TPAMI
  * 2011). The embedding is split into `m` subvectors; each subspace
  * gets a `k`-centroid codebook; a vector is stored as `m` small codes
  * (m=8, k=16 ⇒ 8 nibbles — 64× smaller than 64 float64 dims).
  *
  * Why this matters at 100 TB: the ANN candidate join shuffles CODES
  * (bytes) instead of raw vectors (kilobytes), and the asymmetric-
  * distance scoring of a candidate is `m` array lookups into a
  * per-query table — the corpus' raw vectors are touched only for the
  * final exact re-rank of a small shortlist. Codebooks are plan-time
  * literals (m·k·(dim/m) doubles), trained driver-side on a
  * deterministic hash-sample — the standard recipe; PQ quality needs a
  * representative sample, not the corpus.
  *
  * Everything is deterministic: sample = lowest xxhash64(id) rows,
  * k-center greedy seeding (max-min L2, hash tiebreak), fixed Lloyd
  * iteration count, first-index argmin ties.
  */
object Pq {

  /** `books(s)(c)` = centroid `c` of subspace `s`, each of length
    * dim/m. */
  type Codebooks = Array[Array[Array[Double]]]

  /** Train per-subspace L2 k-means codebooks driver-side on the
    * `sampleN` corpus vectors with the smallest xxhash64(id) — one
    * TakeOrdered pass over the corpus, then pure local arithmetic.
    */
  def train(corpus: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 10,
            sampleN: Int = 2048,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): Codebooks = {
    val sample: Array[(Long, Array[Double])] = corpus
      .select(xxhash64(col(idCol)).as("__h"),
        col(vecCol).cast("array<double>").as("__v"))
      .orderBy("__h").limit(sampleN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(sample.nonEmpty, "Pq.train: empty corpus")
    val dim = sample.head._2.length
    require(dim % m == 0, s"Pq.train: dim $dim not divisible by m=$m")
    val d = dim / m

    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); s += x * x; i += 1 }; s
    }

    // subspaces are independent — train them on driver cores in
    // parallel (k=256 × 10 Lloyd iters over 2048 samples is ~0.3 s/
    // subspace single-threaded). Each subspace's arithmetic is
    // untouched (same summation order within a subspace), so the
    // codebooks are bit-identical to the sequential form.
    import scala.collection.parallel.CollectionConverters._
    (0 until m).par.map { s =>
      val sub = sample.map { case (h, v) => (h, v.slice(s * d, (s + 1) * d)) }
      // k-center greedy seeding: start from the min-hash row; each next
      // seed is the point with the largest distance to its nearest
      // chosen seed (hash tiebreak) — no RNG, spreads seeds out.
      var cents = Array(sub.head._2)
      val minD = Array.fill(sub.length)(Double.MaxValue)
      while (cents.length < math.min(k, sub.length)) {
        val newest = cents.last
        var best = 0; var bestD = -1.0; var bestH = Long.MaxValue
        var i = 0
        while (i < sub.length) {
          val dd = l2(sub(i)._2, newest)
          if (dd < minD(i)) minD(i) = dd
          if (minD(i) > bestD ||
              (minD(i) == bestD && sub(i)._1 < bestH)) {
            best = i; bestD = minD(i); bestH = sub(i)._1
          }
          i += 1
        }
        cents = cents :+ sub(best)._2
      }
      // Lloyd under L2, empty cell keeps its centroid (deterministic)
      for (_ <- 0 until iters) {
        val sums = Array.fill(cents.length)(new Array[Double](d))
        val counts = new Array[Long](cents.length)
        for ((_, v) <- sub) {
          var bc = 0; var bd = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            val dd = l2(v, cents(c))
            if (dd < bd) { bd = dd; bc = c }
            c += 1
          }
          counts(bc) += 1
          var j = 0
          while (j < d) { sums(bc)(j) += v(j); j += 1 }
        }
        cents = Array.tabulate(cents.length) { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }
      }
      cents
    }.toArray
  }

  /** Attach `pq_code` (array<int>, length m): per subspace the L2
    * argmin over the codebook, computed as `‖c‖² − 2⟨x_s, c⟩` with
    * literal centroids (the `‖x_s‖²` term is constant under the
    * argmin). Two-step select keeps every distance array a named,
    * single-evaluation column — `array_position(arr, array_min(arr))`
    * references it twice, and ties break to the first index.
    */
  def encode(df: DataFrame, books: Codebooks,
             vecCol: String = "embedding"): DataFrame =
    // fused per-row quantizer (functions.PqEncode): one pass over the
    // expression-embedded codebooks instead of m·k separate vec_dot
    // calls; distance rule and first-minimum tie-break bit-identical
    df.withColumn("pq_code",
      call_function("pq_encode", col(vecCol), booksLit(books)))

  private def booksLit(books: Codebooks): Column =
    typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)

  /** Reconstruction x̂ from a code: concatenated codebook centroids —
    * the decoder side of the quantizer (spec / diagnostics; production
    * scoring never reconstructs, it looks up). */
  def decodeCol(code: Column, books: Codebooks): Column =
    concat(books.indices.map(s =>
      element_at(typedlit(books(s).map(_.toSeq).toSeq), code(s) + 1)): _*)

  /** ADC top-k with exact re-rank: each query precomputes its m×k
    * dot-product table ONCE (`⟨q_s, c⟩` for every centroid — m·k small
    * dots per query row); scoring a corpus code is then m array
    * lookups, no floating-point dot against the corpus vector. The
    * approximate top `shortlist` per query re-ranks with true cosine
    * against the raw vectors of just those rows.
    *
    * Plan shape: corpus codes (id + m bytes) broadcast-join the query
    * table; one shuffle for the per-query shortlist window; the
    * re-rank join touches `|queries|·shortlist` raw vectors only.
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, books: Codebooks,
              k: Int, shortlist: Int = 50,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val m = books.length
    val codes = encode(corpus, books, vecCol)
      .select(col(idCol).as("corpus_id"), col("pq_code"))
    // per-query lookup table: tbl(s)(c) = <q_s, c_{s,c}> (fused pass)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__tbl",
        call_function("pq_adc_table", col("__qv"), booksLit(books)))
      .select(col("query_id"), col("__tbl"))
    val approx = codes.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("__score", (0 until m).map(s =>
        element_at(element_at(col("__tbl"), s + 1),
          element_at(col("pq_code"), s + 1) + 1)).reduce(_ + _))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("corpus_id").asc)
    val short = approx.withColumn("__r", row_number().over(ws))
      .filter(col("__r") <= shortlist)
      .select("query_id", "corpus_id")
    rerank(short, corpus, queries, k, idCol, vecCol)
  }

  /** Exact cosine re-rank of a `(query_id, corpus_id)` shortlist
    * against the corpus raw vectors — the final IVFADC stage, shared
    * by every PQ entry point. Touches `|queries|·shortlist` raw
    * vectors: the shortlist side is the small one, the corpus join
    * prunes to just those ids. */
  private def rerank(short: DataFrame, corpus: DataFrame,
                     queries: DataFrame, k: Int,
                     idCol: String, vecCol: String): DataFrame = {
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv2"))
    // the shortlist is |queries|·shortlist rows BY CONSTRUCTION (a
    // constant, never a corpus fraction) — broadcast it explicitly so
    // the corpus side is never shuffled by this join; without the hint
    // the planner sizes the window subtree from its corpus-derived
    // child estimate and can fall back to a full corpus sort-merge
    val rer = broadcast(short).join(cv, Seq("corpus_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", Similarity.cosine(col("__qv2"), col("__cv")))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    rer.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** The IVF-PQ candidate stage, exposed for the scale invariant
    * (`inv_sim4_rerank_ratio` counts these rows at 1x and 32x — the
    * exact-re-rank volume must stay FLAT as the corpus grows, the
    * property that separates IVFADC from a corpus-fraction brute
    * force): coarse k-means cells prune to `nprobe` cells per query,
    * ADC scores the surviving codes, and the top `shortlist` ids per
    * query come back. `shortlist` is a CONSTANT (k·α, default 200 for
    * k=5), never a corpus fraction — re-rank cost is
    * `|queries|·shortlist` regardless of corpus size.
    */
  def ivfShortlist(corpus: DataFrame, queries: DataFrame, books: Codebooks,
                   nlist: Int = 16, nprobe: Int = 4,
                   kmeansIters: Int = 3, shortlist: Int = 200,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val m = books.length
    val cents = Similarity.kmeansCentroids(corpus, nlist, kmeansIters,
      idCol = idCol, vecCol = vecCol)
    // index side: cell + code per vector, fused into ONE corpus pass —
    // cell assignment and PQ encoding are both per-row projections
    // against plan-time literals, so computing them in one select
    // removes the encode ⋈ assign id join (two corpus scans + an
    // exchange) the join formulation paid. Values are identical: same
    // pq_encode call, same top-1 cell expression, 1:1 rows per id.
    val codes = encode(corpus, books, vecCol)
      .withColumn("__tc",
        element_at(Similarity.topCells(col(vecCol), cents, 1), 1))
      .select(col(idCol).as("corpus_id"), col("pq_code"),
        col("__tc.cell").as("cell"))
    // probe side: nprobe nearest cells + the ADC table per query —
    // the fused per-row kernel (same (cosine desc, cell asc) pick
    // order), not a crossJoin x nlist amplification + window shuffle
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__tc",
        explode(Similarity.topCells(col("__qv"), cents, nprobe)))
      .withColumn("__tbl",
        call_function("pq_adc_table", col("__qv"), booksLit(books)))
      .select(col("query_id"), col("__tc.cell").as("cell"), col("__tbl"))
    val approx = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("__score", (0 until m).map(s =>
        element_at(element_at(col("__tbl"), s + 1),
          element_at(col("pq_code"), s + 1) + 1)).reduce(_ + _))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("corpus_id").asc)
    approx.withColumn("__sr", row_number().over(ws))
      .filter(col("__sr") <= shortlist)
      .select("query_id", "corpus_id")
  }

  /** IVF-PQ: the standard billion-scale index (IVFADC in the PQ
    * paper §IV) — coarse k-means cells prune the search to `nprobe`
    * cells per query, PQ codes score the survivors, exact cosine
    * re-ranks the [[ivfShortlist]]. The corpus table carries
    * (id, cell, code) — at 100 TB, partition by `cell` on disk and a
    * probe reads `nprobe/nlist` of the codes (bytes per vector),
    * touching raw vectors only for `|queries|·shortlist` rows.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, books: Codebooks,
                 k: Int, nlist: Int = 16, nprobe: Int = 4,
                 kmeansIters: Int = 3, shortlist: Int = 200,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    rerank(
      ivfShortlist(corpus, queries, books, nlist, nprobe,
        kmeansIters, shortlist, idCol, vecCol),
      corpus, queries, k, idCol, vecCol)

  // ------------------------------------------------- persisted IVF-PQ index

  /** Persist the IVFADC index: coarse centroids, PQ codebooks, and the
    * corpus CODES partitioned by cell —
    * {{{
    *   <path>/centroids/   # (cell, centroid) — the coarse quantizer
    *   <path>/codebooks/   # (subspace, centroid, values) — m·k rows
    *   <path>/codes/cell=N # (id, pq_code) — 8 bytes/vector + the id
    * }}}
    * The build-once/probe-many split sim5 has for plain IVF, at PQ
    * compression: the index holds CODES, not raw vectors (~100× less
    * IO than sim5's cells/ layout at embedding dims that matter), and
    * a probe's broadcast cell join lets dynamic partition pruning read
    * `nprobe/nlist` of it. Raw vectors stay in the corpus table and
    * are touched only by the exact re-rank of the constant shortlist.
    */
  def writeIvfPqIndex(corpus: DataFrame, path: String, books: Codebooks,
                      nlist: Int = 16, kmeansIters: Int = 3,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Similarity.kmeansCentroids(corpus, nlist, kmeansIters,
      idCol = idCol, vecCol = vecCol)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    books.zipWithIndex.flatMap { case (cbs, s) =>
      cbs.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
    }.toSeq.toDF("subspace", "centroid", "values")
      .repartition(1) // m·k tiny rows — one footer, not 32
      .write.mode("overwrite").parquet(s"$path/codebooks")
    // cell + code fused into ONE corpus pass (same rationale and same
    // values as the ivfShortlist index side): the old
    // encode ⋈ assign join cost a second corpus scan and an exchange
    encode(corpus, books, vecCol)
      .withColumn("__tc",
        element_at(Similarity.topCells(col(vecCol), cents, 1), 1))
      .select(col(idCol), col("pq_code"), col("__tc.cell").as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/codes")
  }

  /** Codebooks back from `<path>/codebooks` (m·k driver-bounded rows). */
  def readCodebooks(spark: org.apache.spark.sql.SparkSession,
                    path: String): Codebooks = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .select("subspace", "centroid", "values").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"no codebooks under $path")
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cs) =>
      cs.sortBy(_._2).map(_._3)
    }.toArray
  }

  /** Probe a [[writeIvfPqIndex]] index: nprobe cells per query via the
    * persisted coarse quantizer, ADC over the pruned code partitions
    * (the broadcast cell join drives dynamic partition pruning — a
    * probe READS `nprobe/nlist` of the index), exact cosine re-rank of
    * the constant shortlist against the corpus raw vectors.
    */
  def probeIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, corpus: DataFrame, queries: DataFrame,
                      k: Int, nprobe: Int = 4, shortlist: Int = 200,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val books = readCodebooks(spark, path)
    val m = books.length
    val cents = spark.read.parquet(s"$path/centroids")
    val codes = spark.read.parquet(s"$path/codes")
      .select(col(idCol).as("corpus_id"), col("pq_code"), col("cell"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__tc",
        explode(Similarity.topCells(col("__qv"), cents, nprobe)))
      .withColumn("__tbl",
        call_function("pq_adc_table", col("__qv"), booksLit(books)))
      .select(col("query_id"), col("__tc.cell").as("cell"), col("__tbl"))
    val approx = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("__score", (0 until m).map(s =>
        element_at(element_at(col("__tbl"), s + 1),
          element_at(col("pq_code"), s + 1) + 1)).reduce(_ + _))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("corpus_id").asc)
    val short = approx.withColumn("__sr", row_number().over(ws))
      .filter(col("__sr") <= shortlist)
      .select("query_id", "corpus_id")
    rerank(short, corpus, queries, k, idCol, vecCol)
  }
}
