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

    val j = agg.join(broadcast(revisions), Seq(keyCol))
      .filter(col("bucket_s") < col("rev_end_s") &&
              (col("bucket_s") + granularityS) > col("rev_start_s"))
      .withColumn("coef",
        (least(col("bucket_s") + granularityS, col("rev_end_s")) -
         greatest(col("bucket_s"), col("rev_start_s"))).cast("double") /
          granularityS.toDouble)

    j.groupBy(col(grpCol), col("bucket_s"))
      .agg(sum(col("mv") * col("coef")).as("v"))
  }
}
