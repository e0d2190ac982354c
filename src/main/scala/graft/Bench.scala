package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every query on SPARK_GRAFT_SF_DIR, forcing full
  * materialization via the noop sink (count() alone would let Catalyst
  * prune unreferenced computed columns), prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM, parquet footers, and codegen paths once so
    // per-query numbers are steady state, not first-query JIT cost
    for (t <- Seq("lineitem", "orders", "customer", "events", "documents",
        "embeddings", "region", "nation", "part", "supplier"))
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("event_type").count().write.format("noop")
      .mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      // a failed query must read as a regression, not a speedup
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else 1e9)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
