package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol ingestion (reference semantics:
  * gnocchi/rest/influxdb.py:40-103,154-259): each line is
  * `measurement[,tag=v...] field=value[,field=value...] [ns_timestamp]`,
  * producing one measure per numeric field with
  * metric name `measurement.field@tag=v,...` (tags sorted by key, the
  * resource tag excluded — it becomes the resource id).
  *
  * Parsing runs in a typed `mapPartitions` (the escape rules `\,` `\ `
  * `\=` and quoted strings make a character scanner clearer and faster
  * than regexp chains); it is per-row work with no shuffle, so it
  * scales linearly and pipelines into whatever aggregation follows.
  */
object LineProtocol {

  /** Split `s` on unescaped occurrences of `sep`, honoring `\` escapes
    * and (when `quotes`) double-quoted regions. Escape sequences are
    * KEPT in the output pieces — nested splits still need them; call
    * [[unescape]] only on final tokens.
    */
  private def splitUnescaped(s: String, sep: Char,
                             quotes: Boolean = false): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      // a backslash escapes the next char OUTSIDE quotes (influx
      // escaping of separators) AND inside quoted string values
      // (where \" must not toggle the quote state)
      if (c == '\\' && i + 1 < s.length) {
        cur.append(c).append(s.charAt(i + 1)); i += 2
      } else if (quotes && c == '"') {
        inQ = !inQ; cur.append(c); i += 1
      } else if (c == sep && !inQ) {
        out += cur.result(); cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    out += cur.result()
    out.result()
  }

  private def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        b.append(s.charAt(i + 1)); i += 2
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.result()
  }

  private def parseValue(raw: String): Option[Double] = {
    val v = raw.trim
    if (v.isEmpty || v.startsWith("\"")) None // string fields: not measures
    else if (v == "t" || v == "T" || v.equalsIgnoreCase("true")) Some(1.0)
    else if (v == "f" || v == "F" || v.equalsIgnoreCase("false")) Some(0.0)
    else {
      val num = if (v.endsWith("i") || v.endsWith("u")) v.dropRight(1) else v
      try Some(num.toDouble) catch { case _: NumberFormatException => None }
    }
  }

  case class Parsed(resource_id: String, metric: String, ts_ns: Option[Long],
                    value: Double)

  /** Parse a one-string-column DataFrame of line-protocol text into
    * `(resource_id, metric, ts_ns, value)` rows. Unparseable lines and
    * non-numeric fields are dropped (the reference 400s the whole
    * request; a 100 TB batch pipeline skips and counts instead).
    */
  def parse(lines: DataFrame, lineCol: String = "line",
            resourceTag: String = "host"): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col(lineCol).cast("string")).as[String]
      .mapPartitions { it =>
        it.flatMap { line =>
          val trimmed = line.trim
          if (trimmed.isEmpty || trimmed.startsWith("#")) Iterator.empty
          else {
            // key section | fields section | optional timestamp
            val parts = splitUnescaped(trimmed, ' ', quotes = true)
              .filter(_.nonEmpty)
            if (parts.length < 2) Iterator.empty
            else {
              val keyParts = splitUnescaped(parts.head, ',')
              val measurement = unescape(keyParts.head)
              val tags = keyParts.tail.flatMap { t =>
                splitUnescaped(t, '=') match {
                  case Seq(k, v) => Some(unescape(k) -> unescape(v))
                  case _ => None
                }
              }
              // a line missing the resource tag carries NULL here: the
              // REST door aborts 400 with the reference's message
              // (influxdb.py:198-208) rather than silently rebucketing
              // every line under an invented resource id
              val resource = tags.collectFirst {
                case (k, v) if k == resourceTag => v
              }.orNull
              val metricTags = tags.filterNot(_._1 == resourceTag)
                .sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")
              val suffix = if (metricTags.isEmpty) "" else s"@$metricTags"
              val tsNs = if (parts.length >= 3)
                parts(2).toLongOption else None
              splitUnescaped(parts(1), ',').iterator.flatMap { f =>
                splitUnescaped(f, '=') match {
                  case Seq(k, raw) => parseValue(raw).map(v =>
                    // "/" is not a legal gnocchi metric-name char, so
                    // the reference rewrites it (influxdb.py:225-229);
                    // the resource id is NOT rewritten
                    Parsed(resource,
                      s"$measurement.${unescape(k)}$suffix".replace('/', '_'),
                      tsNs, v))
                  case _ => None
                }
              }
            }
          }
        }
      }
      .toDF()
  }
}
