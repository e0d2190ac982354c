package graft.api

/** The maintenance plane as a SERVICE — the reference's metricd daemon
  * family (cli/metricd.py:160-358) reduced to one interval scheduler
  * over the facade's maintenance doors:
  *
  *  - processor pass (MetricProcessor._run_job, cli/metricd.py:221-246)
  *    → [[Graft.process]]: drain staged measures into the stores;
  *  - janitor pass (MetricJanitor._run_job, cli/metricd.py:260-298)
  *    → retention expiry (J3) + inactive raw truncation (J5 analogue,
  *    chef.py:186-243) on every active store, then resource
  *    end-dating / expired-resource auto-clean (J6, chef.py:57-184)
  *    when the corresponding knobs are set — both default OFF, as the
  *    reference's `metric_inactive_after` / `resource_cleanup_after`;
  *  - reporting pass (MetricReporting._run_job, cli/metricd.py:249-257)
  *    → the J7 backlog report, kept in [[lastBacklog]] and logged.
  *
  * [[stopAfterProcessingMetrics]] mirrors the
  * `--stop-after-processing-metrics` probe (cli/metricd.py:327-358
  * metricd_tester): drain without timers until at least N metrics'
  * staged measures have been processed or the backlog is dry, then
  * return — the deployment smoke-probe mode.
  *
  * The scheduler is one daemon thread; each pass runs Spark jobs that
  * parallelize on the cluster, so more janitor threads would only
  * contend on the driver. Fleet scale-out happens at the STORE lock
  * granularity (per-sack, [[graft.ingest.MetricStore]]), not by
  * multiplying schedulers.
  */
final class Janitor(g: Graft,
                    processingDelayS: Double = 60.0,
                    cleanupDelayS: Double = 300.0,
                    reportingDelayS: Double = 120.0,
                    metricInactiveAfterS: Option[Long] = None,
                    resourceCleanupAfterS: Option[Long] = None,
                    clockS: () => Long = () =>
                      System.currentTimeMillis() / 1000) {

  @volatile private var worker: Option[Thread] = None
  @volatile private var stopping = false

  /** Last J7 backlog snapshot taken by the reporting pass. */
  @volatile var lastBacklog: Map[String, Long] = Map.empty

  private val processed = new java.util.concurrent.atomic.AtomicLong
  private val cleanups = new java.util.concurrent.atomic.AtomicLong
  private val autoCleaned = new java.util.concurrent.atomic.AtomicLong

  /** #metrics whose staged measures the processor passes drained. */
  def metricsProcessed: Long = processed.get()
  /** #janitor cleanup passes completed. */
  def cleanupPasses: Long = cleanups.get()
  /** #resources the auto-clean pass deleted over this lifecycle. */
  def resourcesAutoCleaned: Long = autoCleaned.get()

  /** One processor pass: drain everything staged; returns the number
    * of metrics that had pending measures. */
  def processOnce(): Long = {
    val backlog = g.status().size.toLong
    g.process()
    processed.addAndGet(backlog)
    backlog
  }

  /** One janitor pass: J3 retention expiry, J5 inactive raw
    * truncation, then the J6 resource lifecycle passes when their
    * knobs are set. */
  def cleanupOnce(): Long = {
    val now = clockS()
    g.expireRetention(now)
    g.truncateRawAll()
    val cleaned =
      if (metricInactiveAfterS.isEmpty && resourceCleanupAfterS.isEmpty) 0L
      else g.maintainResources(now, metricInactiveAfterS,
        resourceCleanupAfterS)
    cleanups.incrementAndGet()
    autoCleaned.addAndGet(cleaned)
    cleaned
  }

  /** One reporting pass: snapshot the J7 backlog. */
  def reportOnce(): Map[String, Long] = {
    lastBacklog = g.status()
    if (lastBacklog.nonEmpty)
      System.err.println(s"[janitor] backlog: ${lastBacklog.size} metrics, " +
        s"${lastBacklog.values.sum} measures")
    lastBacklog
  }

  /** The probe mode: loop processor passes with no timers until at
    * least `n` metrics have been processed or a pass finds the backlog
    * dry; returns the number of metrics processed. */
  def stopAfterProcessingMetrics(n: Long): Long = {
    var done = 0L
    var dry = false
    while (!dry && done < n) {
      val c = processOnce()
      done += c
      dry = c == 0
    }
    done
  }

  /** Start the interval loop (idempotent while running). */
  def start(): Unit = synchronized {
    if (worker.exists(_.isAlive)) return
    stopping = false
    val t = new Thread(() => {
      var nextProcess = 0L // fire each job immediately on startup
      var nextCleanup = 0L
      var nextReport = 0L
      while (!stopping) {
        val nowMs = System.currentTimeMillis()
        try {
          if (nowMs >= nextProcess) {
            processOnce()
            nextProcess = nowMs + (processingDelayS * 1000).toLong
          }
          if (nowMs >= nextCleanup) {
            cleanupOnce()
            nextCleanup = nowMs + (cleanupDelayS * 1000).toLong
          }
          if (nowMs >= nextReport) {
            reportOnce()
            nextReport = nowMs + (reportingDelayS * 1000).toLong
          }
        } catch {
          // a failed pass must not kill the service (the reference's
          // _run_job loop logs and continues, cli/metricd.py:137-141)
          case e: InterruptedException => throw e
          case e: Throwable =>
            System.err.println(s"[janitor] pass failed: ${e.getMessage}")
        }
        try Thread.sleep(50)
        catch { case _: InterruptedException => stopping = true }
      }
    }, "graft-janitor")
    t.setDaemon(true)
    worker = Some(t)
    t.start()
  }

  /** Stop the loop and wait for the worker to exit. */
  def stop(): Unit = synchronized {
    stopping = true
    worker.foreach { t => t.interrupt(); t.join(30000) }
    worker = None
  }
}
