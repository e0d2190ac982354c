package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft-bench-scale-32x"
    spark.read.parquet(s"$dir/events.parquet").count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      Queries.all("m1_merge_dedup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(s"scale_m1 run$i ${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
