package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.MetricStore
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}

/** Scratch profiler for the streaming drain (st1 shape) at sf0.1: times
  * each phase of the st1 bench row separately — dedup+cache, the two
  * staged parquet drops, each processAllAvailable drain (with
  * micro-batch counts from the query progress), and the read-back — so
  * the st1 cost attributes to staging IO vs checkpointed drain vs store
  * ingest rather than being one opaque 10 s.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    for (pass <- 1 to 2) {
      val root = s"/tmp/graft-stprof-$pass"
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/staging"))
      val store = new MetricStore(spark, s"$root/store",
        ArchivePolicy("st1", 744,
          Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
          Set("mean", "count")))
      val d = time(s"p$pass" + "_dedup_cache") {
        val x = spark.read.parquet(s"$dir/events.parquet")
        val dd = Queries.events(spark, dir)
          .groupBy(col("event_type").as("metric_id"),
            col("ts").as("timestamp"))
          .agg(max_by(col("value"), col("event_id")).as("value"))
          .cache()
        dd.count(); dd
      }
      val q = time(s"p$pass" + "_stream_start") {
        import org.apache.spark.sql.DataFrame
        val schema = MetricStore.emptyMeasures(spark).schema
        spark.readStream.schema(schema).parquet(s"$root/staging/*")
          .writeStream.option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val t0 = System.nanoTime()
            val n = batch.count()
            val tc = (System.nanoTime() - t0) / 1e9
            val t1 = System.nanoTime()
            if (n > 0) store.addMeasures(batch)
            println(f"[stprof]   micro-batch $id: rows=$n " +
              f"count=$tc%.2f s addMeasures=${(System.nanoTime() - t1) / 1e9}%.2f s")
          }
          .start()
      }
      try {
        val cuts = Seq(
          col("timestamp") < lit("2024-01-16").cast("timestamp"),
          col("timestamp") >= lit("2024-01-16").cast("timestamp"))
        cuts.zipWithIndex.foreach { case (c, i) =>
          time(s"p${pass}_stage_write_$i") {
            d.filter(c).write.mode("overwrite").parquet(s"$root/chunk-$i")
            fs.rename(new org.apache.hadoop.fs.Path(s"$root/chunk-$i"),
              new org.apache.hadoop.fs.Path(s"$root/staging/chunk-$i"))
          }
          val before = q.recentProgress.length
          time(s"p${pass}_drain_$i") { q.processAllAvailable() }
          println(s"[stprof] p${pass}_drain_$i micro-batches: " +
            (q.recentProgress.length - before))
        }
      } finally q.stop()
      d.unpersist()
      time(s"p$pass" + "_readback") {
        store.getMeasuresMany(
            Seq("click", "view", "purchase", "signup", "error"),
            Seq("mean", "count"), 3600L).count()
      }
    }
    spark.stop()
  }
}
