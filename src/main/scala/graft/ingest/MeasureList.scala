package graft.ingest

import org.json4s._

/** Driver-side measure-list timestamp parsing shared by every REST
  * measure door (the reference's utils.to_timestamps:86-123): the
  * timestamp FORMAT is fixed per list by its FIRST element — epoch
  * numbers, absolute strings (ISO-8601 with Z / offset / bare, or
  * SQL-style "2015-01-01 12:00:00", both of which numpy.datetime64
  * accepts), or relative timespans — and mixing formats within one
  * list is the 400 (gabbits/metric-timestamp-format.yaml). Relative
  * stamps anchor on ONE `nowMs` the caller fixes per request
  * (utils.py:80-84); pre-epoch timestamps reject on every door
  * (utils.py:119-120).
  *
  * ONE home for the contract: RestApi.parseMeasureList (single-metric
  * and batch-by-metric doors) and Graft.batchAddMeasures (the
  * batch-by-resource door) both delegate here — the two used to carry
  * near-identical copies that drifted on SQL-style strings.
  */
object MeasureList {

  sealed trait TsMode
  case object Epoch extends TsMode
  case object Abs extends TsMode
  case object Rel extends TsMode

  private val epochRe = "^-?[0-9]+(\\.[0-9]+)?$"

  def modeOf(first: JValue): TsMode = first match {
    case JString(s) if s.matches(epochRe) => Epoch
    case JString(s) =>
      if (graft.model.Timespan.parseS(s).isDefined && !s.contains("T")) Rel
      else Abs
    case _ => Epoch
  }

  /** Absolute string form: ISO-8601 (bare gets a Z appended — but NOT
    * when an offset is already present, positive OR negative) or
    * SQL-style. */
  def absOf(s: String): java.sql.Timestamp =
    if (s.contains("T"))
      java.sql.Timestamp.from(java.time.Instant.parse(
        if (!s.endsWith("Z") && !s.matches(".*[+-][0-9]{2}:?[0-9]{2}$"))
          s + "Z"
        else s))
    else java.sql.Timestamp.valueOf(s)

  /** One timestamp under the list's mode; an out-of-mode form is the
    * mixed-format 400, a pre-epoch stamp rejects. */
  def tsOf(v: JValue, mode: TsMode, nowMs: Long): java.sql.Timestamp = {
    val t = tsOf0(v, mode, nowMs)
    graft.api.GraftError.valid(t.getTime >= 0,
      "Timestamp must be after Epoch")
    t
  }

  private def tsOf0(v: JValue, mode: TsMode,
                    nowMs: Long): java.sql.Timestamp = (mode, v) match {
    case (Epoch, JString(s)) if s.matches(epochRe) =>
      new java.sql.Timestamp((s.toDouble * 1000).toLong)
    case (Epoch, JInt(n))     => new java.sql.Timestamp(n.toLong * 1000)
    case (Epoch, JLong(n))    => new java.sql.Timestamp(n * 1000)
    case (Epoch, JDouble(n))  => new java.sql.Timestamp((n * 1000).toLong)
    case (Epoch, JDecimal(n)) => new java.sql.Timestamp((n * 1000).toLong)
    case (Rel, JString(s)) => graft.model.Timespan.parseS(s) match {
      case Some(spanS) =>
        new java.sql.Timestamp(nowMs + (spanS * 1000).toLong)
      case None => graft.api.GraftError.badInput(
        s"mixed timestamp formats: relative batch got '$s'")
    }
    // a relative or epoch-number string in an absolute batch is the
    // mixed-format 400 (the reference's datetime64 parse of an epoch
    // string lands in a nonsense far-future year, never a clean ingest)
    case (Abs, JString(s)) if graft.model.Timespan.parseS(s).isEmpty &&
        !s.matches(epochRe) =>
      absOf(s)
    case (_, other) => throw new IllegalArgumentException(
      s"mixed timestamp formats: got $other")
  }

  def numOf(v: JValue): Double = v match {
    case JInt(n) => n.toDouble; case JLong(n) => n.toDouble
    case JDouble(n) => n;       case JDecimal(n) => n.toDouble
    case other => throw new IllegalArgumentException(s"bad value: $other")
  }

  /** Full list form: (timestamp, value) points under the first
    * element's mode. */
  def parse(arr: List[JValue],
            nowMs: Long): Seq[(java.sql.Timestamp, Double)] = {
    val mode = modeOf(arr.headOption.map(_ \ "timestamp")
      .getOrElse(JNothing))
    arr.map(m =>
      (tsOf(m \ "timestamp", mode, nowMs), numOf(m \ "value")))
  }
}
