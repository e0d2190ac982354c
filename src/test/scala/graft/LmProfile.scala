package graft.llm

import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Throwaway stage-level profile of scale_lm1_perplexity (VERDICT r4
  * #4: 5.9 s flat at 32× — find where the time sits before optimizing).
  * Times each pipeline prefix on the amplified corpus; run via
  * `Test/runMain graft.LmProfile` after a bench has built
  * /tmp/graft-bench-scale-32x.
  */
object LmProfile {
  def main(args: Array[String]): Unit = {
    val s = SparkEntry.configure(org.apache.spark.sql.SparkSession.builder)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-bench-scale-32x")
    val df = s.read.parquet(s"$dir/documents.parquet")
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    def time(name: String)(d: => org.apache.spark.sql.DataFrame): Unit = {
      noop(d) // warm: janino + footers
      val t0 = System.nanoTime
      noop(d)
      println(f"XP $name ${(System.nanoTime - t0) / 1e9}%6.2f s")
      s.catalog.clearCache(); System.gc()
    }

    val idCol = "doc_id"; val textCol = "text"
    time("0_scan_only")(df.select(idCol, textCol))
    time("1_collapse_groups")(Dedup.collapseExact(df, idCol, textCol))
    def reps = {
      val groups = Dedup.collapseExact(df, idCol, textCol)
      Dedup.rebalance(Dedup.collapseRepsW(df, groups, idCol))
        .withColumn("__w", split(Dedup.normalized(col(textCol)), " "))
    }
    time("2_reps_with_words")(reps.select(col(idCol), size(col("__w")).as("n")))
    def dp = {
      val withWords = reps
      val n1 = greatest(size(col("__w")) - 1, lit(0))
      withWords
        .select(col(idCol), col("__gs"), explode(arrays_zip(
          slice(col("__w"), lit(1), n1), slice(col("__w"), lit(2), n1))).as("p"))
        .select(col(idCol), col("__gs"), col("p.0").as("prev"), col("p.1").as("cur"))
        .groupBy(col(idCol), col("prev"), col("cur"))
        .agg(count(lit(1)).as("k"), first(col("__gs")).as("__gs"))
    }
    time("3_doc_bigrams")(dp)
    time("4_corpus_counts") {
      val cb = dp.groupBy(col("prev"), col("cur"))
        .agg(sum(col("k") * col("__gs")).as("cb"))
      cb.groupBy(col("prev")).agg(sum(col("cb")).as("cu"))
    }
    time("5_full_perplexity")(graft.llm.TextAnalysis.perplexity(df))
    s.stop()
  }
}
