package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Accounting for operator-INTERNAL persisted frames whose lifetime
  * must outlive the operator call (the returned plan reads them, so
  * they can only be unpersisted after the CALLER's action).
  *
  * Release is AUTOMATIC: the first [[persist]] on a session installs a
  * `QueryExecutionListener`, and after any successful action the
  * tracked frames whose cache that action actually READ (an
  * `InMemoryTableScanExec` over the same logical plan, located through
  * AQE wrappers, subqueries, and nested cached plans) are unpersisted.
  * This is the natural pipeline boundary — the operator's consumer
  * materialized its result, so the internal frame has served its
  * purpose. Unpersist is correctness-safe by construction (a second
  * action on the same result would just recompute), and no operator
  * here runs intermediate actions over a tracked frame before
  * returning, so nothing releases early. [[release]] stays for callers
  * that want deterministic cleanup (specs, session teardown).
  *
  * Without this, every decontaminate / cluster / docFrequency call in
  * a long-lived session leaks one cache entry for the session's
  * lifetime (`spark.catalog.clearCache()` clears them too, at the
  * price of dropping every other cached frame).
  */
object OpCaches {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  // sessions with the auto-release listener installed (weak: a stopped
  // session must not be pinned by the registry)
  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Persist `df` MEMORY_AND_DISK and register it for auto-release
    * after the first action that reads it (or explicit [[release]]).
    */
  def persist(df: DataFrame): DataFrame = synchronized {
    if (installed.add(df.sparkSession))
      df.sparkSession.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = releaseReadBy(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  /** Every `InMemoryTableScanExec` reachable from `p`, descending
    * through AQE wrappers, subqueries, and the cached plans of the
    * scans themselves (a tracked frame built over another tracked
    * frame counts both as read).
    */
  private def scansIn(p: SparkPlan): Seq[InMemoryTableScanExec] = {
    val here = p match {
      case s: InMemoryTableScanExec => s +: scansIn(s.relation.cachedPlan)
      case a: AdaptiveSparkPlanExec => scansIn(a.executedPlan)
      case q: QueryStageExec        => scansIn(q.plan)
      case _                        => Seq.empty
    }
    here ++ (p.children ++ p.subqueries).flatMap(scansIn)
  }

  private def releaseReadBy(qe: QueryExecution): Unit = synchronized {
    if (tracked.isEmpty) return
    val read =
      try scansIn(qe.executedPlan).map(_.relation.cacheBuilder.logicalPlan)
      catch { case _: Throwable => Seq.empty } // never fail the action
    if (read.isEmpty) return
    // DELIBERATELY not session-scoped: Spark may complete an action
    // under a cloned execution session, so requiring
    // `t.sparkSession eq qe.sparkSession` leaves entries tracked
    // forever. The cost of the broad match is bounded: a sameResult
    // twin in another session releases early and merely RECOMPUTES
    // (correctness-safe by construction, see the class doc).
    val (hit, keep) = tracked.partition(t =>
      read.exists(_.sameResult(t.queryExecution.analyzed)))
    hit.foreach(_.unpersist(false))
    tracked.clear()
    tracked ++= keep
  }

  /** Unpersist every tracked frame (non-blocking) — deterministic
    * cleanup for specs and session teardown; the listener already
    * handles the steady state.
    */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Number of currently tracked cache entries (spec introspection). */
  def trackedCount: Int = synchronized(tracked.size)
}
