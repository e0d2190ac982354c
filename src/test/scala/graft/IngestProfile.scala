package graft

import org.apache.spark.sql.functions._
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}

/** Scratch: stage-level timing of cold + warm MetricStore ingest at 32x.
  * Not a spec — run via Test/runMain graft.IngestProfile. */
object IngestProfile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-bench-scale-32x"
    val root = "/tmp/graft-profile-ingest"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val store = new graft.ingest.MetricStore(spark, root,
      ArchivePolicy("bench", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean", "sum", "max", "count")))
    val measures = Queries.adaptTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(concat(lit("u"), pmod(col("user_id"), lit(256))).as("metric_id"),
        col("ts").as("timestamp"), col("value"))
    val cut = lit("2024-01-30 00:00:00").cast("timestamp")
    val head = measures.filter(col("timestamp") < cut)
    val tail = measures.filter(col("timestamp") >= cut)
    t("cold ingest (30 days)")(store.addMeasures(head))
    t("warm ingest (1 day tail)")(store.addMeasures(tail))
    t("warm ingest (tail again)")(store.addMeasures(tail))
    spark.stop()
  }
}
