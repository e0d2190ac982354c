package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ingest.MetricStore

/** Structured Streaming ingestion: the streaming analogue of the
  * incoming→metricd pipeline (SURVEY §2.9 I6). A file-source stream of
  * raw measures drains through the same incremental job per micro-batch
  * (`foreachBatch`), so batch and streaming share one code path —
  * the back-window rule doubles as the watermark
  * (BoundTimeSerie, carbonara.py:321-476).
  */
object StreamingIngest {

  /** Start draining a staging directory of parquet measure files
    * (metric_id STRING, timestamp TIMESTAMP, value DOUBLE) into the
    * store. Checkpointed → exactly-once per micro-batch combined with
    * the store's idempotent split overwrites.
    */
  def start(spark: SparkSession, stagingDir: String, checkpointDir: String,
            store: MetricStore): StreamingQuery = {
    val schema = MetricStore.emptyMeasures(spark).schema
    spark.readStream
      .schema(schema)
      .parquet(stagingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.addMeasures(batch)
      }
      .start()
  }

  /** Pure-streaming windowed aggregation (no store): watermarked
    * tumbling-window mean/count per metric — the Spark-native shape of
    * a gnocchi archive-policy item for pipelines that want push-based
    * results instead of a materialized table.
    */
  def windowedAgg(measures: DataFrame, granularity: String,
                  watermark: String): DataFrame =
    measures
      .withWatermark("timestamp", watermark)
      .groupBy(col("metric_id"), window(col("timestamp"), granularity))
      .agg(avg("value").as("mean"), count("value").as("count"),
        min("value").as("min"), max("value").as("max"), sum("value").as("sum"))
      .select(col("metric_id"), col("window.start").as("bucket"),
        col("mean"), col("count"), col("min"), col("max"), col("sum"))
}
