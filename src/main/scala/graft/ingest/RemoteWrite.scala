package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Prometheus remote-write and collectd/amqp1d ingestion
  * (reference: rest/api.py:2319-2371, gnocchi/amqp1d.py:60-160).
  *
  * The prometheus path is end-to-end REAL wire format: request bodies
  * are snappy-compressed protobuf WriteRequests, decoded per partition
  * via snappy-java (on the Spark classpath) + the hand-rolled
  * [[PromProto]] reader — mapPartitions only at the codec boundary,
  * like the multimodal decode; everything after is pure Catalyst.
  * The amqp1d path decodes real AMQP 1.0 bare messages via the
  * hand-rolled [[Amqp]] codec (collectd JSON rides in the message
  * body, amqp1d.py:117-131), then applies the collectd mapping.
  */
object RemoteWrite {

  /** Decode AMQP 1.0 bare-message bodies (the amqp1d transport payload)
    * into collectd measures: parse each message at the codec boundary,
    * then the JSON/measure mapping runs in Catalyst.
    */
  def amqpToMeasures(messages: DataFrame,
                     msgCol: String = "msg"): DataFrame = {
    val spark = messages.sparkSession
    import spark.implicits._
    val bodies = messages.select(col(msgCol)).as[Array[Byte]]
      .mapPartitions(_.map(m => Amqp.parseMessage(m).body))
      .toDF("body")
    collectdToMeasures(bodies)
  }

  /** Decode snappy-compressed protobuf remote-write bodies
    * (rest/api.py:2327-2336: `snappy.uncompress` + `WriteRequest()
    * .ParseFromString`) into sample rows `(labels, ts_ms, value)`.
    */
  def decodeRemoteWrite(bodies: DataFrame,
                        bodyCol: String = "body"): DataFrame = {
    val spark = bodies.sparkSession
    import spark.implicits._
    bodies.select(col(bodyCol)).as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { bytes =>
          PromProto.parseWriteRequest(
              org.xerial.snappy.Snappy.uncompress(bytes))
            .iterator
            .flatMap(s => s.samples.map { case (ts, v) => (s.labels, ts, v) })
        }
      }.toDF("labels", "ts_ms", "value")
  }

  /** Full I3 pipeline: wire bodies → decode → semantic mapping. */
  def remoteWriteToMeasures(bodies: DataFrame,
                            bodyCol: String = "body"): DataFrame =
    prometheusToMeasures(decodeRemoteWrite(bodies, bodyCol))

  /** Prometheus: rows `(labels map<string,string>, ts_ms, value)` →
    * measures with resource id `job@instance` and metric `__name__`
    * (rest/api.py:2337-2359). Unnamed series are dropped; NaN samples
    * (prometheus staleness markers) are dropped.
    */
  def prometheusToMeasures(samples: DataFrame): DataFrame =
    samples
      .withColumn("metric", col("labels").getItem("__name__"))
      .filter(col("metric").isNotNull && !isnan(col("value")))
      .select(
        // missing job/instance default to "none" (rest/api.py:2340-2341
        // attrs.get("job", "none")), forming resource id "job@instance"
        concat_ws("@",
          coalesce(col("labels").getItem("job"), lit("none")),
          coalesce(col("labels").getItem("instance"), lit("none")))
          .as("resource_id"),
        col("metric"),
        timestamp_millis(col("ts_ms")).as("timestamp"),
        col("value"))

  private val collectdSchema = ArrayType(StructType(Seq(
    StructField("host", StringType),
    StructField("plugin", StringType),
    StructField("plugin_instance", StringType),
    StructField("type", StringType),
    StructField("type_instance", StringType),
    StructField("time", DoubleType),
    StructField("dsnames", ArrayType(StringType)),
    StructField("values", ArrayType(DoubleType)))))

  /** Collectd JSON (the amqp1d payload): one measure per entry of the
    * `values` array, metric named exactly as the reference's
    * `CollectdFormatHandler._serialize_identifier` (amqp1d.py:169-184):
    * `plugin[-plugin_instance]@type[-type_instance][-dsname]`, the
    * dsname suffix only when the message carries MORE THAN ONE
    * dsname; resource = host. One declared divergence: the reference
    * stamps every measure with receipt utcnow (amqp1d.py:187) — here
    * the measure keeps the message's own `time`, so a failed flush
    * retries idempotently (new-wins merge) instead of double-counting.
    */
  def collectdToMeasures(json: DataFrame, jsonCol: String = "body"): DataFrame = {
    val rec = explode(from_json(col(jsonCol), collectdSchema)).as("r")
    json.select(rec)
      .select(col("r.*"))
      .withColumn("__z", arrays_zip(col("dsnames"), col("values")))
      .select(col("host"), col("plugin"), col("plugin_instance"),
        col("type"), col("type_instance"), col("time"),
        size(col("dsnames")).as("__nds"),
        explode(col("__z")).as("dv"))
      .select(
        col("host").as("resource_id"),
        concat(
          concat_ws("-", col("plugin"),
            when(col("plugin_instance") === "", null)
              .otherwise(col("plugin_instance"))),
          lit("@"),
          concat_ws("-", col("type"),
            when(col("type_instance") === "", null)
              .otherwise(col("type_instance"))),
          when(col("__nds") > 1,
            concat(lit("-"), col("dv.dsnames"))).otherwise(lit("")))
          .as("metric"),
        timestamp_seconds(col("time")).as("timestamp"),
        col("dv.values").as("value"))
      .filter(col("value").isNotNull)
  }
}
