package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway perf experiment harness (not a spec; run via
  * Test/runMain graft.PerfScratch). */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val s = SparkEntry.configure(org.apache.spark.sql.SparkSession.builder)
      .master("local[32]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft-bench-scale-32x"
    def events = s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      .select("user_id","event_type","ts","value","event_id")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"XP $label%-28s ${(System.nanoTime-t0)/1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    noop(events.groupBy("event_type").count)

    def mergedReal = {
      val ev = events
      val newB = ev.filter(col("event_id") % 3 === 0)
        .withColumn("value", col("value") * 2)
      graft.timeseries.TimeSeriesOps.merge(newB, ev,
        Seq("user_id", "event_type"), "ts", col("event_id"),
        orderBound = 1L << 61)
    }
    for (i <- 1 to 3) timed(s"real merge $i") {
      noop(mergedReal.groupBy("event_type").agg(count(lit(1)), sum("value"))) }
    s.stop()

  }
}
