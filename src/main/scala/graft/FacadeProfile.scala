package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}

/** Scratch profiler for the facade-lifecycle rows (g6 shape) at sf0.1:
  * times each segment — store wipe, facade + policy + metric creates,
  * the three staged batch adds, process() (the drain), the catalog
  * frame registrations, and the aggregatesByResource read — twice
  * (JIT-warm second pass), so the 6 s row attributes to ingest vs
  * catalog vs read-path cost instead of being one opaque number.
  */
object FacadeProfile {
  def main(args: Array[String]): Unit = {
    val s = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    import s.implicits._
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[facprof] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (pass <- 1 to 2) {
      val root = s"/tmp/graft-facprof-$pass"
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val g = new graft.api.Graft(s, root)
      time(s"p${pass}_create") {
        g.createPolicy(ArchivePolicy("g6", 0,
          Seq(ArchivePolicyItem(Granularity.seconds(3600), None, None)),
          Set("mean")))
        for (m <- Seq("m_c", "m_p", "m_v")) g.createMetric(m, "g6")
      }
      val meas = time(s"p${pass}_dedup_frame") {
        val d = Queries.events(s, dir)
          .groupBy(col("event_type").as("metric_id"),
            col("ts").as("timestamp"))
          .agg(max_by(col("value"), col("event_id")).as("value"))
          .cache() // the g6 query's shape: one dedup shared by 3 batches
        d
      }
      time(s"p${pass}_batch_add") {
        g.batchAddMeasures(meas.filter(col("metric_id") === "click")
          .withColumn("metric_id", lit("m_c")))
        g.batchAddMeasures(meas.filter(col("metric_id") === "purchase")
          .withColumn("metric_id", lit("m_p")))
        g.batchAddMeasures(meas.filter(col("metric_id") === "view")
          .withColumn("metric_id", lit("m_v")))
      }
      time(s"p${pass}_process") { g.process(); meas.unpersist() }
      time(s"p${pass}_set_catalog") {
        g.setResources(Seq(("srv1", "a"), ("srv2", "b"), ("srv3", "c"))
          .toDF("id", "zone"))
        g.setMetrics(Seq(("m_c", "srv1", "load"), ("m_p", "srv2", "load"),
          ("m_v", "srv3", "load")).toDF("metric_id", "resource_id", "name"))
      }
      time(s"p${pass}_agg_read") {
        g.aggregatesByResource("(metric load mean)", 3600L,
            "zone in ['a', 'b']")
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
