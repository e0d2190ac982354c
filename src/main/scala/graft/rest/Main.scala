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
    // metricd-style maintenance service (processor + janitor + backlog
    // reporting, cli/metricd.py:160-358): opt in with
    // GRAFT_JANITOR_DELAY_S=<seconds>; the resource-lifecycle knobs
    // mirror metric_inactive_after / resource_cleanup_after (both off
    // by default, as the reference)
    for (d <- sys.env.get("GRAFT_JANITOR_DELAY_S").map(_.toDouble)) {
      val jan = new graft.api.Janitor(g,
        processingDelayS = d, cleanupDelayS = math.max(d, 5 * d),
        reportingDelayS = d,
        metricInactiveAfterS =
          sys.env.get("GRAFT_METRIC_INACTIVE_AFTER_S").map(_.toLong),
        resourceCleanupAfterS =
          sys.env.get("GRAFT_RESOURCE_CLEANUP_AFTER_S").map(_.toLong))
      jan.start()
      sys.addShutdownHook(jan.stop())
      println(s"graft janitor running every ${d}s")
    }
    val bound = new RestServer(new RestApi(g)).serve(port)
    println(s"graft REST listening on :$bound (store root $root)")
    Thread.currentThread.join() // serve until killed
  }
}
