package graft

import org.apache.spark.sql.functions._

/** Throwaway scratch harness (not a spec; run via
  * Test/runMain graft.PerfScratch). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val s = SparkEntry.configure(org.apache.spark.sql.SparkSession.builder)
      .master("local[32]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val root = "/tmp/graft-scratch-ingest"
    val measures = s.read.parquet("/tmp/graft-bench-scale-32x/events.parquet")
      .select(concat(lit("u"), pmod(col("user_id"), lit(256))).as("metric_id"),
        timestamp_micros(expr("ts div 1000")).as("timestamp"),
        col("value"))
    measures.write.format("noop").mode("overwrite").save() // warm
    for (i <- 1 to 2) {
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val store = new graft.ingest.MetricStore(s, root,
        ArchivePolicy("bench", 0,
          Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
          Set("mean", "sum", "max", "count")))
      val t0 = System.nanoTime
      store.addMeasures(measures)
      println(f"XP ingest $i ${(System.nanoTime-t0)/1e9}%6.2f s")
    }
    s.stop()
  }
}
