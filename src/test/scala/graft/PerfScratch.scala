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
    val docs = s.read.parquet(s"$dir/documents.parquet")
    noop(docs.groupBy().count)
    for (i <- 1 to 3) timed(s"scale es1 $i") {
      noop(graft.llm.Dedup.removeRepeatedSpans(docs, w = 5)) }
    s.stop()
  }
}
