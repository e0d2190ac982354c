package graft

import org.apache.spark.sql.functions._

/** Throwaway perf experiment harness (not a spec; run via
  * Test/runMain graft.PerfScratch). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val s = SparkEntry.configure(org.apache.spark.sql.SparkSession.builder)
      .master("local[32]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft-bench-scale-32x"
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"XP $label%-28s ${(System.nanoTime-t0)/1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val em = s.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    noop(em.groupBy().count)
    timed("ivf index build (160k)") {
      graft.llm.Similarity.writeIvfIndex(em, "/tmp/graft-bench-ivf", nlist = 64)
    }
    for (i <- 1 to 2) timed(s"ivf index probe $i") {
      noop(graft.llm.Similarity.probeIvfIndex(s, "/tmp/graft-bench-ivf",
        em.filter(col("vec_id") < 10), k = 5, nprobe = 8))
    }
    s.stop()
  }
}
