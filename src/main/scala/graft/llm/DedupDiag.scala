package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic counters for the LSH dedup candidate stage — the numbers
  * an operator needs when sizing `maxBucket` (and validating the
  * collapse-first scale claim) on a corpus the oracle can't reach.
  * Runs the same plan as [[Dedup.minhashLsh]] up to (but not
  * including) the exact-jaccard verify join:
  *
  *  - `reps`: documents surviving the exact-content collapse — the
  *    row count every later stage actually sees (the collapse-first
  *    invariant: exact copies multiply ONLY the final expand, never
  *    the banding/candidate work);
  *  - `maxRawBucket`: the largest (band, bucket) population BEFORE the
  *    cap filter — `maxRawBucket <= maxBucket` means the cap never
  *    engaged and zero candidates were silently dropped;
  *  - `candidatePairs`: distinct id pairs entering the verify join —
  *    the volume that must stay near-linear in distinct content.
  */
object DedupDiag {

  final case class LshStats(reps: Long, maxRawBucket: Long,
                            candidatePairs: Long)

  def lshCandidateStats(docs: DataFrame, n: Int = 3, numHashes: Int = 128,
                        bands: Int = 32, idCol: String = "doc_id",
                        textCol: String = "text",
                        maxBucket: Int = 100000): LshStats = {
    import org.apache.spark.storage.StorageLevel
    val rows = numHashes / bands
    val groups = Dedup.collapseExact(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val reps = Dedup.collapseReps(docs, groups, idCol)
      val sh = Dedup.withShingles(Dedup.rebalance(reps), textCol, n, "sh")
        .select(col(idCol).as("id"),
          transform(col("sh"), s => xxhash64(s)).as("shh"))
      val sig = sh.select(col("id"),
        call_function("minhash_sig", col("shh"), lit(numHashes)).as("__sig"))
      val banded0 = sig.select(col("id"),
          posexplode(array(Dedup.bandBucketCols(col("__sig"), bands, rows): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
        .repartition(col("band"), col("bucket"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val sizes = banded0.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bn"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val nReps = banded0.select("id").distinct().count()
          val maxRaw = sizes.agg(max(col("__bn"))).collect()
            .headOption.map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
            .getOrElse(0L)
          val small = sizes.filter(col("__bn") <= maxBucket)
            .select("band", "bucket")
          val banded = banded0.join(small.hint("shuffle_hash"),
            Seq("band", "bucket"), "left_semi")
          val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
          val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
          val cand = l.join(r.hint("shuffle_hash"), Seq("band", "bucket"))
            .filter(col("id_a") < col("id_b"))
            .select("id_a", "id_b").distinct().count()
          LshStats(nReps, maxRaw, cand)
        } finally sizes.unpersist()
      } finally banded0.unpersist()
    } finally groups.unpersist()
  }
}
