package graft

import org.apache.spark.sql.functions._

/** Throwaway scratch harness (not a spec; run via
  * Test/runMain graft.PerfScratch). Times the store WRITE path
  * (scale_j1 shape: 32× amplified events → 256 metrics) twice, plus
  * the frame-only cost of its inputs, to locate where ingest time sits.
  */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val s = SparkEntry.configure(org.apache.spark.sql.SparkSession.builder)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val root = "/tmp/graft-scratch-ingest"
    val measures = Queries.adaptTs(
        s.read.parquet("/tmp/graft-bench-scale-32x/events.parquet"))
      .select(concat(lit("u"), pmod(col("user_id"), lit(256))).as("metric_id"),
        col("ts").as("timestamp"), col("value"))
    def t0n[A](f: => A): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    println(f"XP frame_noop ${t0n(measures.write.format("noop").mode("overwrite").save())}%6.2f s")
    for (i <- 1 to 2) {
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val store = new graft.ingest.MetricStore(s, root,
        ArchivePolicy("bench", 0,
          Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
          Set("mean", "sum", "max", "count")))
      println(f"XP ingest $i ${t0n(store.addMeasures(measures))}%6.2f s")
    }
    s.stop()
  }
}
