package graft

/** Throwaway scratch harness (not a spec; run via
  * Test/runMain graft.PerfScratch). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val s = SparkEntry.configure(org.apache.spark.sql.SparkSession.builder)
      .master("local[8]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(s).count()
    println(s"XP entry rows = $n")
    s.stop()
  }
}
