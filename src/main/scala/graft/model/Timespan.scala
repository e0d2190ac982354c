package graft.model

/** Driver-side pytimeparse-lite (the reference's utils.to_timespan /
  * to_timestamps relative form, utils.py:103-109): ONE optional leading
  * sign applying to the whole expression, then unsigned "<n><unit>"
  * segments — "-5 minutes", "2h32m" = 9120 s, "-2h32m" = -9120 s,
  * "1.5 days". The Catalyst twin for corpus-scale bodies lives in
  * [[graft.ingest.JsonMeasures]].
  */
object Timespan {

  private val unitS: Map[String, Double] = Map(
    "s" -> 1, "sec" -> 1, "secs" -> 1, "second" -> 1, "seconds" -> 1,
    "m" -> 60, "min" -> 60, "mins" -> 60, "minute" -> 60, "minutes" -> 60,
    "h" -> 3600, "hr" -> 3600, "hrs" -> 3600, "hour" -> 3600,
    "hours" -> 3600, "d" -> 86400, "day" -> 86400, "days" -> 86400,
    "w" -> 604800, "wk" -> 604800, "wks" -> 604800,
    "week" -> 604800, "weeks" -> 604800).map { case (k, v) => k -> v.toDouble }

  private val seg =
    java.util.regex.Pattern.compile("\\s*([0-9]*\\.?[0-9]+)\\s*([a-z]+)")

  /** Seconds for a timespan string; None when not a timespan. */
  def parseS(s0: String): Option[Double] = {
    val t = s0.trim.toLowerCase
    if (t.isEmpty) return None
    val (sign, s) = t.charAt(0) match {
      case '-' => (-1.0, t.substring(1))
      case '+' => (1.0, t.substring(1))
      case _   => (1.0, t)
    }
    if (s.isEmpty) return None
    val m = seg.matcher(s)
    var total = 0.0
    var pos = 0
    while (pos < s.length) {
      if (!m.find(pos) || m.start != pos) return None
      val unit = unitS.getOrElse(m.group(2), return None)
      total += m.group(1).toDouble * unit
      pos = m.end
    }
    Some(sign * total)
  }
}
