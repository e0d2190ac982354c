package graft.rest

import org.apache.spark.sql.SparkSession

/** Standalone REST server (the reference's gnocchi-api entry point,
  * rest/app.py): `runMain graft.rest.Main [port] [storeRoot]`. One
  * local session serves the facade; on a cluster the same wiring runs
  * on the driver.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8041)
    val root = args.lift(1).getOrElse("/tmp/graft-rest-store")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = new graft.api.Graft(spark, root)
    // clean shutdown snapshots pending frame registrations and releases
    // the catalog WRITER LOCK (a kill -9 leaves it; the next start
    // breaks it automatically once the pid is provably dead)
    sys.addShutdownHook(g.close())
    val bound = new RestServer(new RestApi(g)).serve(port)
    println(s"graft REST listening on :$bound (store root $root)")
    Thread.currentThread.join() // serve until killed
  }
}
