package graft.llm
import graft.SparkEntry

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._


/** Scratch profiler for minhashLsh prefixes (the dd2/dd6 shared cost). */
object Dd2Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dd2prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm
    time("warm_pairs") { noop(Dedup.minhashLsh(docs, 3, 64, 16, 0.4)) }

    val n = 3; val numHashes = 64; val bands = 16
    val rows = numHashes / bands
    val groups = Dedup.collapseExact(docs, "doc_id", "text")
    time("1_collapseExact") { noop(groups) }
    val reps = docs.join(
      groups.select(col("__rep").as("doc_id")).hint("shuffle_hash"),
      Seq("doc_id"), "left_semi")
    time("2_reps") { noop(reps) }
    val sh = Dedup.withShingles(Dedup.rebalance(reps), "text", n, "sh")
      .select(col("doc_id").as("id"),
        transform(col("sh"), s => xxhash64(s)).as("shh"))
    time("3_shingles_hashed") { noop(sh) }
    val sig = sh.select(col("id"),
      call_function("minhash_sig", col("shh"), lit(numHashes)).as("__sig"))
    time("4_signatures") { noop(sig) }
    val bandCols = (0 until bands).map { b =>
      xxhash64(((b * rows until (b + 1) * rows)
        .map(i => element_at(col("__sig"), i + 1))
        :+ lit(b.toLong)): _*)
    }
    val banded0 = sig.select(col("id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val banded1 = banded0.repartition(col("band"), col("bucket"))
    val smallBuckets = banded1.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= 100000)
      .select("band", "bucket")
    val banded = banded1
      .join(smallBuckets.hint("shuffle_hash"), Seq("band", "bucket"), "left_semi")
    time("5_banded_capped") { noop(banded) }
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cand = l.join(r.hint("shuffle_hash"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("6_candidates") { noop(cand) }
    val shA = sh.select(col("id").as("id_a"), col("shh").as("sh_a"))
    val shB = sh.select(col("id").as("id_b"), col("shh").as("sh_b"))
    val repPairs = cand.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .filter(col("jaccard") >= 0.4)
      .select("id_a", "id_b", "jaccard")
    time("7_verified_pairs") { noop(repPairs) }
    time("8_full_expand") { noop(Dedup.minhashLsh(docs, 3, 64, 16, 0.4)) }
    // second run of each heavy stage, JIT-warm
    time("3b_shingles_hashed") { noop(sh) }
    time("4b_signatures") { noop(sig) }
    time("5b_banded_capped") { noop(banded) }
    time("7b_verified_pairs") { noop(repPairs) }
    spark.stop()
  }
}
