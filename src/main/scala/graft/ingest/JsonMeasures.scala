package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** I1 JSON measures wire format (reference rest/api.py:455-468): a POST
  * body is a JSON array of `{"timestamp": ..., "value": ...}` objects;
  * the batch endpoint maps metric id → that array
  * (`{uuid: [measures...]}`, rest/api.py:1855-1860). Timestamps accept
  * ISO-8601 strings or epoch numbers (utils.py:72-122).
  *
  * Parsing is pure Catalyst (`from_json` + explode) — per-row work, no
  * shuffle, codegen'd — so a 100 TB backlog of POST bodies parses as a
  * linear scan.
  */
object JsonMeasures {

  private val measureArray: DataType =
    ArrayType(StructType(Seq(
      StructField("timestamp", StringType),
      StructField("value", DoubleType))))

  /** ISO string or epoch-seconds number → timestamp (utils.py:72-122).
    * The numeric branch is regex-guarded so neither cast ever sees the
    * other form (ANSI mode makes malformed casts throw, not null). */
  private def parseTs(ts: Column): Column =
    // epoch numbers include scientific notation (1.7e9 is a valid
    // JSON number a float-epoch sender can emit)
    when(ts.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][-+]?[0-9]+)?$"),
      timestamp_micros((ts.cast("double") * 1e6).cast("long")))
      .otherwise(to_timestamp(ts))

  /** Single-metric form: rows of (metric id, JSON array body). */
  def parse(df: DataFrame, idCol: String = "metric_id",
            bodyCol: String = "body"): DataFrame =
    df.select(col(idCol).as("metric_id"),
        explode(from_json(col(bodyCol), measureArray)).as("m"))
      .select(col("metric_id"),
        parseTs(col("m.timestamp")).as("timestamp"),
        col("m.value").as("value"))

  /** Batch form: rows of one JSON object body, metric id → array. */
  def parseBatch(df: DataFrame, bodyCol: String = "body"): DataFrame =
    df.select(explode(
        from_json(col(bodyCol), MapType(StringType, measureArray)))
        .as(Seq("metric_id", "ms")))
      .select(col("metric_id"), explode(col("ms")).as("m"))
      .select(col("metric_id"),
        parseTs(col("m.timestamp")).as("timestamp"),
        col("m.value").as("value"))
}
