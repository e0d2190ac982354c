package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalog maintenance jobs (SURVEY §2.10 J6): resource end-dating and
  * auto-clean, reference chef.py:57-184. Pure DataFrame transforms —
  * the caller persists the returned catalog state, so the jobs compose
  * with whatever table format holds the catalog.
  */
object Maintenance {

  /** End-date resources whose every metric has been inactive for
    * STRICTLY more than `inactiveS` seconds as of `nowS`
    * (chef.py:126-133: `last_measure_timestamp < moment_now - inactive`,
    * strict). The stamp is `nowS` — the janitor RUN time, chef.py's
    * `moment_now` (update_resource(ended_at=moment_now)) — NOT the last
    * activity timestamp: the auto-clean grace countdown starts at
    * detection, so a long-idle resource still gets the full grace
    * period after the janitor first notices it. Already-ended resources
    * keep their original stamp (chef.py:172-175 skips them).
    * `lastActivity` is `(resource_id, last_ts_s)` — typically
    * max(last_measure_timestamp) over the resource's metrics; resources
    * with no row in it are left untouched (no metrics ≠ inactive).
    */
  def endDateInactive(resources: DataFrame, lastActivity: DataFrame,
                      nowS: Long, inactiveS: Long): DataFrame =
    resources
      .join(lastActivity.select(col("resource_id").as("id"),
        col("last_ts_s")), Seq("id"), "left")
      .withColumn("ended_at",
        when(col("ended_at").isNull && col("last_ts_s").isNotNull &&
            col("last_ts_s") < nowS - inactiveS,
          timestamp_seconds(lit(nowS)))
        .otherwise(col("ended_at")))
      .drop("last_ts_s")

  /** Delete resources ended more than `graceS` seconds ago
    * (chef.py:119-184) — returns the surviving catalog.
    */
  def autoClean(resources: DataFrame, nowS: Long, graceS: Long): DataFrame =
    // STRICTLY more than graceS ago deletes — the boundary row (ended
    // exactly graceS ago) survives, as the contract says
    resources.filter(col("ended_at").isNull ||
      unix_timestamp(col("ended_at")) >= nowS - graceS)

  /** Resource resurrection on ingest (storage/__init__.py:694-725):
    * a measure batch arriving for an ended resource clears `ended_at`,
    * but ONLY when the batch's latest measure timestamp is at or after
    * the end date — older (backfill) measures do not restore the
    * resource. `activity` = (resource_id, last_ts_s) per-resource
    * latest measure epoch-seconds from the batch.
    */
  def resurrect(resources: DataFrame, activity: DataFrame): DataFrame =
    resources
      .join(activity.select(col("resource_id").as("id"), col("last_ts_s")),
        Seq("id"), "left")
      .withColumn("ended_at",
        when(col("ended_at").isNotNull && col("last_ts_s").isNotNull &&
            unix_timestamp(col("ended_at")) <= col("last_ts_s"),
          lit(null).cast("timestamp"))
        .otherwise(col("ended_at")))
      .drop("last_ts_s")
}
