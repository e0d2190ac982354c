package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.MetricStore
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}

/** Scratch profiler for the store-ingest path (j1 shape) at sf0.1:
  * times the batch prep, the full addMeasures, and the read-back
  * separately, twice (JIT-warm second pass).
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ingprof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    val ev = Queries.events(spark, dir)
    println(s"[ingprof] n_events=${ev.count()}")
    val batch = ev.groupBy(col("event_type").as("metric_id"),
        col("ts").as("timestamp"))
      .agg(max_by(col("value"), col("event_id")).as("value"))

    for (pass <- 1 to 2) {
      val root = s"/tmp/graft-ingprof-$pass"
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val store = new MetricStore(spark, root, ArchivePolicy("p", 0,
        Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
        Set("mean", "max", "count")))
      time(s"p$pass" + "_batch_prep") {
        batch.write.format("noop").mode("overwrite").save()
      }
      time(s"p$pass" + "_addMeasures") { store.addMeasures(batch) }
      time(s"p$pass" + "_read_back") {
        store.getMeasuresMany(
          batch.select("metric_id").distinct().collect()
            .map(_.getString(0)).toSeq,
          Seq("mean", "max", "count"), 3600L)
          .write.format("noop").mode("overwrite").save()
      }
      // second batch into the SAME store: the merge-with-buffer arm
      time(s"p$pass" + "_addMeasures2") { store.addMeasures(batch) }
    }
    spark.stop()
  }
}
