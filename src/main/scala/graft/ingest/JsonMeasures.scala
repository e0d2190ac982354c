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

  /** ISO string, epoch-seconds number, or relative timespan
    * ("-5 minutes", "2h32m") → timestamp (utils.py:72-123; the
    * pytimeparse fallback at :103-109). All three branches are
    * regex-guarded pure Catalyst so no cast ever sees another form
    * (ANSI mode makes malformed casts throw, not null); relative
    * stamps anchor on `current_timestamp()`, which Spark folds to ONE
    * value per query — the reference's single `utcnow()` per batch.
    * Divergence note (pinned by IngestSpec "bulk parser is per-element
    * lenient"): the reference fixes the FORMAT per measure list from
    * its first element (mixed → 400, utils.to_timestamps:86-123) —
    * that contract is enforced at every REST measure door
    * (RestApi.parseMeasureList, Graft.batchAddMeasures); THIS
    * corpus-scale parser stays per-element lenient, since a per-list
    * mode would need a second pass over each body to find its first
    * element before any row could parse.
    */
  private val relUnits: Seq[(String, Double)] = Seq(
    "seconds" -> 1, "second" -> 1, "secs" -> 1, "sec" -> 1, "s" -> 1,
    "minutes" -> 60, "minute" -> 60, "mins" -> 60, "min" -> 60, "m" -> 60,
    "hours" -> 3600, "hour" -> 3600, "hrs" -> 3600, "hr" -> 3600,
    "h" -> 3600, "days" -> 86400, "day" -> 86400, "d" -> 86400,
    "weeks" -> 604800, "week" -> 604800, "wks" -> 604800, "wk" -> 604800,
    "w" -> 604800).map { case (k, v) => k -> v.toDouble }
  // longest alternatives first, so "mins" can't half-match as "m"+"ins"
  private val unitAlt = relUnits.map(_._1).sortBy(-_.length).mkString("|")
  // pytimeparse grammar: ONE optional leading sign applying to the
  // WHOLE expression, then unsigned <n><unit> segments —
  // "-2h32m" = -(2h + 32m) = -9120 s, not -2h + 32m
  private val segPat = s"([0-9]*\\.?[0-9]+)\\s*($unitAlt)"
  private val relPat =
    s"^\\s*[+-]?\\s*(?:[0-9]*\\.?[0-9]+\\s*(?:$unitAlt)\\s*)+$$"

  private def unitSeconds(u: Column): Column =
    relUnits.foldLeft(lit(null).cast("double")) { case (acc, (name, s)) =>
      when(u === name, lit(s)).otherwise(acc)
    }

  private def relSeconds(ts: Column): Column = {
    val mag = aggregate(
      regexp_extract_all(lower(ts), lit(segPat), lit(0)), lit(0.0),
      (acc, seg) => acc + regexp_extract(seg, segPat, 1).cast("double") *
        unitSeconds(regexp_extract(seg, segPat, 2)))
    when(ltrim(ts).startsWith("-"), -mag).otherwise(mag)
  }

  private def parseTs(ts: Column): Column =
    // epoch numbers include scientific notation (1.7e9 is a valid
    // JSON number a float-epoch sender can emit). EVERY arm is
    // poison-line-proof under ANSI: try_cast nulls an epoch whose
    // microseconds overflow Long (a regex-legal "1e300" would throw
    // from a bare cast), the relative arm runs its arithmetic in
    // double before ONE try_cast (segment sums can exceed Long), and
    // the ISO fallback is try_to_timestamp — a malformed string in a
    // 100 TB backlog must drop as one bad row, never abort the batch
    // (the REST door's strict per-list 400 contract lives in
    // RestApi.parseMeasureList, not here).
    when(ts.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][-+]?[0-9]+)?$"),
      timestamp_micros((ts.cast("double") * 1e6).try_cast("long")))
      .when(lower(ts).rlike(relPat), timestamp_micros(
        (unix_micros(current_timestamp()).cast("double") +
          relSeconds(ts) * 1e6).try_cast("long")))
      .otherwise(try_to_timestamp(ts))

  /** Single-metric form: rows of (metric id, JSON array body).
    * Rows whose timestamp is absent or unparseable DROP (skip-and-
    * count corpus semantics, like LineProtocol's malformed lines). */
  def parse(df: DataFrame, idCol: String = "metric_id",
            bodyCol: String = "body"): DataFrame =
    df.select(col(idCol).as("metric_id"),
        explode(from_json(col(bodyCol), measureArray)).as("m"))
      .select(col("metric_id"),
        parseTs(col("m.timestamp")).as("timestamp"),
        col("m.value").as("value"))
      .filter(col("timestamp").isNotNull)

  /** Batch form: rows of one JSON object body, metric id → array. */
  def parseBatch(df: DataFrame, bodyCol: String = "body"): DataFrame =
    df.select(explode(
        from_json(col(bodyCol), MapType(StringType, measureArray)))
        .as(Seq("metric_id", "ms")))
      .select(col("metric_id"), explode(col("ms")).as("m"))
      .select(col("metric_id"),
        parseTs(col("m.timestamp")).as("timestamp"),
        col("m.value").as("value"))
      .filter(col("timestamp").isNotNull)
}
