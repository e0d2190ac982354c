package graft

import org.apache.spark.sql.functions._

/** Throwaway perf experiment harness (not a spec; run via
  * Test/runMain graft.PerfScratch). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val s = SparkEntry.configure(org.apache.spark.sql.SparkSession.builder)
      .master("local[4]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val em = (0L until 64L).map { i =>
      (i, Seq.tabulate(8)(d => math.sin(i * 7.0 + d).abs + 0.1))
    }.toDF("vec_id", "embedding")
    val root = s"/tmp/graft-test-ivf/${System.nanoTime}"
    graft.llm.Similarity.writeIvfIndex(em, root, nlist = 4)
    em.write.mode("overwrite").parquet(s"$root/em")
    val q = s.read.parquet(s"$root/em").filter(col("vec_id") < 3)
    val viaIndex = graft.llm.Similarity
      .probeIvfIndex(s, root, q, k = 3, nprobe = 2)
    viaIndex.collect()
    println("=== EXEC PLAN ===")
    println(viaIndex.queryExecution.executedPlan.toString.take(6000))
    s.stop()
  }
}
