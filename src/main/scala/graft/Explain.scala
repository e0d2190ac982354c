package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit entry point: print the formatted physical plan of one or
  * more queries without executing them — `runMain graft.Explain
  * <sfDir> <query[,query…]>`. The per-operator audit loop (shuffle
  * count, PushedFilters, WholeStageCodegen spans) runs through this.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable =>
        println(s"[explain] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
