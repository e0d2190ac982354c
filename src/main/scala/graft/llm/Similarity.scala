package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Vector math uses the `zip_with`/`aggregate`
  * higher-order functions — codegen'd, no UDFs.
  */
object Similarity {

  /** Dot product of two array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: every query row against every corpus row.
    * Queries are broadcast (small side); corpus scan is embarrassingly
    * parallel; per-query top-k via window rank — one shuffle on query id.
    * This is the exact baseline the ANN variants are checked against.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** IVF-style ANN: partition the corpus into `nlist` cells around
    * deterministically-sampled centroids (one k-means assignment pass);
    * a query probes only the `nprobe` nearest cells. At 100 TB the
    * corpus is bucketed by `cell` on disk so a probe is a partition-
    * pruned scan, not a full pass.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // deterministic centroids: the nlist corpus vectors with smallest ids
    val centroids = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cent_tmp"), col(vecCol).as("centroid"))
      .withColumn("cell", row_number().over(Window.orderBy(col("cent_tmp"))) - 1)
      .drop("cent_tmp")

    def nearestCells(df: DataFrame, vc: String, n: Int, out: String): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("cdist", cosine(col(vc), col("centroid")))
      val w = Window.partitionBy(col(idCol)).orderBy(col("cdist").desc)
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .drop("centroid", "cdist", "crank")
        .withColumnRenamed("cell", out)
    }

    val assigned = nearestCells(
      corpus.select(col(idCol), col(vecCol)), vecCol, 1, "cell")
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cv"), col("cell"))
    val probed = nearestCells(
      queries.select(col(idCol), col(vecCol)), vecCol, nprobe, "cell")
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"))

    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: corpus and queries are hashed into
    * random-hyperplane buckets ([[lshBuckets]]); a query compares only
    * against corpus vectors whose bucket is within `radius` sign flips
    * (pigeonhole chunk join, like simhash pairs), then exact cosine
    * re-ranks. At 100 TB the corpus is written bucketed by `lsh_bucket`
    * so a probe is a bucket-pruned scan.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nbits: Int = 16, radius: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val chunks = radius + 1
    val bitsPer = nbits / chunks
    def chunked(df: DataFrame, role: String): DataFrame =
      lshBuckets(df, nbits, idCol, vecCol)
        .select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_v"),
          posexplode(array((0 until chunks).map { c =>
            shiftrightunsigned(col("lsh_bucket"), c * bitsPer)
              .bitwiseAND(lit((1L << bitsPer) - 1))
          }: _*)))
        .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ck")
    // candidate pairs as ids only — the distinct shuffles 16 bytes/row,
    // not embedding vectors; vectors re-attach after dedup
    val cand = chunked(corpus, "corpus").drop("corpus_v")
      .join(broadcast(chunked(queries, "query").drop("query_v")),
        Seq("chunk", "ck"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id").distinct()
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("corpus_v"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
    val scored = cand.join(cv, Seq("corpus_id")).join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", cosine(col("query_v"), col("corpus_v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Random-hyperplane LSH bucketing for cosine: `nbits` signs of dot
    * products with pseudo-random hyperplanes (deterministic from the
    * dimension index via a hash-derived ±1 pattern — no RNG state).
    * Candidates share a bucket; exact cosine re-ranks.
    */
  def lshBuckets(df: DataFrame, nbits: Int = 16,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // hyperplane b, dim i weight = ±1 from parity of xxhash64(b, i)
    val sig = (0 until nbits).map { b =>
      val proj = aggregate(
        zip_with(col(vecCol),
          transform(sequence(lit(0), size(col(vecCol)) - 1),
            i => when(pmod(xxhash64(lit(b), i), lit(2)) === 0, 1.0d).otherwise(-1.0d)),
          (x, w) => x * w),
        lit(0.0d), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("lsh_bucket", sig)
  }
}
