package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G3 `use_history=true` grouped aggregation (reference
  * rest/aggregates/api.py:191-493): each resource's timeline is sliced
  * into attribute-revision windows; a bucket overlapping a window edge
  * contributes fractionally, weighted by
  * `usage_coefficient = overlap / granularity` (api.py:244-259,462-470);
  * groups falling in the same bucket are summed (api.py:231-241).
  *
  * Implementation: interval join of the bucketed aggregates against the
  * revision windows. The revision table is small (catalog-sized) →
  * broadcast; no shuffle beyond the initial bucket aggregation.
  */
object HistoryAgg {

  /** measures: (keyCol, tsSecCol: epoch-seconds LONG, valueCol DOUBLE)
    * revisions: (keyCol, grpCol, rev_start_s LONG, rev_end_s LONG)
    * Returns (grp, bucket_s, v = sum over keys of bucketMean * coef).
    */
  def weightedGroupAgg(
      measures: DataFrame,
      revisions: DataFrame,
      granularityS: Long,
      keyCol: String,
      tsSecCol: String = "ts_s",
      valueCol: String = "value",
      grpCol: String = "grp"): DataFrame = {

    val agg = measures
      .withColumn("bucket_s",
        (floor(col(tsSecCol) / granularityS) * granularityS).cast("long"))
      .groupBy(col(keyCol), col("bucket_s"))
      .agg(avg(col(valueCol)).as("mv"))

    weightedJoin(agg, revisions, granularityS, keyCol, Seq(grpCol),
      valueCol = "mv").withColumnRenamed("mv", "v")
  }

  /** The Grouper's weighting+summing kernel generalized to a groupby
    * LIST and an arbitrary per-key bucketed frame
    * (rest/aggregates/api.py:244-259 usage_coefficient ×
    * api.py:231-241 sum_groups_same_time_values): interval-join each
    * `(keyCol, bucket_s, value)` row to the key's attribute-revision
    * windows, weight by overlap/granularity, and sum same-bucket
    * values within each `(grpCols..., bucket_s)` group. The revision
    * table is catalog-sized → broadcast; the one shuffle is the final
    * group-sum.
    *
    * measures:  (keyCol, tsSecCol: bucket epoch-seconds LONG, valueCol)
    * revisions: (keyCol, grpCols..., rev_start_s LONG, rev_end_s LONG)
    */
  def weightedJoin(
      measures: DataFrame,
      revisions: DataFrame,
      granularityS: Long,
      keyCol: String,
      grpCols: Seq[String],
      tsSecCol: String = "bucket_s",
      valueCol: String = "value"): DataFrame = {
    val j = measures.join(broadcast(revisions), Seq(keyCol))
      .filter(col(tsSecCol) < col("rev_end_s") &&
              (col(tsSecCol) + granularityS) > col("rev_start_s"))
      .withColumn("__coef",
        (least(col(tsSecCol) + granularityS, col("rev_end_s")) -
         greatest(col(tsSecCol), col("rev_start_s"))).cast("double") /
          granularityS.toDouble)
    j.groupBy((grpCols.map(col) :+ col(tsSecCol)): _*)
      .agg(sum(col(valueCol) * col("__coef")).as(valueCol))
  }
}
