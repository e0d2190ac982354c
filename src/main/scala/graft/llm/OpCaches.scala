package graft.llm

import org.apache.spark.sql.DataFrame

/** Accounting for operator-INTERNAL persisted frames whose lifetime
  * must outlive the operator call (the returned plan reads them, so
  * they can only be unpersisted after the CALLER's action). Each such
  * persist registers here; a long-lived session releases them between
  * pipelines with [[release]] — otherwise every decontaminate /
  * cluster call leaks one cache entry for the session's lifetime.
  * (`spark.catalog.clearCache()` also clears them, at the price of
  * dropping every other cached frame too.)
  */
object OpCaches {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` MEMORY_AND_DISK and register it for [[release]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  /** Unpersist every tracked frame (non-blocking). Call after the
    * results of the operators that used them have been materialized.
    */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }

  /** Number of currently tracked cache entries (spec introspection). */
  def trackedCount: Int = synchronized(tracked.size)
}
