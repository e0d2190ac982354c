package graft.model

import scala.concurrent.duration._

/** Aggregation descriptor: one materialized series of a metric.
  *
  * Mirrors the reference's `Aggregation(method, granularity, timespan)`
  * namedtuple (gnocchi/carbonara.py:570-573). `granularity` is either a
  * fixed duration in nanoseconds or a calendar token (Y/H/Q/M/W).
  */
sealed trait Granularity {
  def token: String
}
object Granularity {
  /** Fixed-width granularity, nanosecond resolution. */
  final case class Fixed(ns: Long) extends Granularity {
    require(ns > 0, s"granularity must be positive: $ns")
    def seconds: Double = ns / 1e9
    def token: String = {
      if (ns % 1_000_000_000L == 0) s"${ns / 1_000_000_000L}s" else s"${ns}ns"
    }
  }
  /** Calendar granularity (gnocchi/calendar.py:95-100): year, half-year,
    * quarter, month, week (anchored Sunday). */
  final case class Calendar(unit: String) extends Granularity {
    require(Calendar.units.contains(unit), s"unknown calendar unit: $unit")
    def token: String = unit
  }
  object Calendar { val units = Set("Y", "H", "Q", "M", "W") }

  def fixed(d: FiniteDuration): Fixed = Fixed(d.toNanos)
  def seconds(s: Long): Fixed = Fixed(s * 1_000_000_000L)

  /** Parse "300", "300.5" (seconds), "1s"/"5m"-style, "<n>ns" (the
    * token form [[Fixed.token]] EMITS for sub-second granularities —
    * the API must accept its own output), calendar tokens, or any
    * pytimeparse phrase ("1 second", "2h32m" — utils.to_timespan
    * tries float(value) first, then pytimeparse, utils.py:138-150;
    * async.yaml posts `granularity: 1 second`). */
  def parse(s0: String): Granularity = {
    val s = s0.trim
    def short: Option[Fixed] = scala.util.Try {
      val (num, mult) = s.last match {
        case 's' => (s.dropRight(1), 1_000_000_000L)
        case 'm' => (s.dropRight(1), 60L * 1_000_000_000L)
        case 'h' => (s.dropRight(1), 3600L * 1_000_000_000L)
        case 'd' => (s.dropRight(1), 86400L * 1_000_000_000L)
        case _   => (s, 1_000_000_000L)
      }
      Fixed((BigDecimal(num) * mult).toLongExact)
    }.toOption
    if (Calendar.units.contains(s)) Calendar(s)
    else if (s.endsWith("ns") && s.length > 2 &&
        s.dropRight(2).forall(_.isDigit))
      Fixed(BigDecimal(s.dropRight(2)).toLongExact)
    else short.getOrElse {
      val secs = Timespan.parseS(s).getOrElse(
        throw new IllegalArgumentException(s"bad granularity: $s0"))
      require(secs > 0, "Timespan must be positive")
      Fixed((BigDecimal(secs) * 1_000_000_000L).toLongExact)
    }
  }
}

final case class Aggregation(
    method: String,
    granularity: Granularity,
    timespanNs: Option[Long])

/** One (granularity, points, timespan) item of an archive policy.
  *
  * Completion rule (gnocchi/archive_policy.py:188-225): timespan =
  * granularity * points; any two of the three determine the third.
  */
final case class ArchivePolicyItem(
    granularity: Granularity,
    points: Option[Long],
    timespanNs: Option[Long]) {
  def completed: ArchivePolicyItem = granularity match {
    case Granularity.Fixed(g) =>
      (points, timespanNs) match {
        case (Some(p), None) => copy(timespanNs = Some(g * p))
        case (None, Some(t)) =>
          // points floors, then timespan RE-DERIVES from it
          // (archive_policy.py:216-219: timespan 1000s at 300s
          // granularity stores points=3, timespan=900s); a timespan
          // below one granule is the reference's ValueError
          val p = t / g
          require(p > 0,
            s"timespan $t below one $g-ns granule: calculated points is 0")
          copy(points = Some(p), timespanNs = Some(g * p))
        case (Some(p), Some(_)) =>
          // points wins and timespan re-derives (archive_policy.py:
          // 221-223 overwrites the submitted timespan unconditionally)
          copy(timespanNs = Some(g * p))
        case (None, None) => this // unlimited retention
      }
    case _: Granularity.Calendar => this
  }
}

/** Archive policy: which aggregations are materialized, at which
  * granularities, retained how long (gnocchi/archive_policy.py:32-170).
  */
final case class ArchivePolicy(
    name: String,
    backWindow: Int,
    definition: Seq[ArchivePolicyItem],
    aggregationMethods: Set[String]) {

  /** Every (method, granularity) series this policy materializes. */
  def aggregations: Seq[Aggregation] =
    for {
      item <- definition.sortBy {
        _.granularity match {
          case Granularity.Fixed(ns) => -ns
          case _                     => Long.MinValue
        }
      }
      m <- aggregationMethods.toSeq.sorted
    } yield Aggregation(m, item.granularity, item.completed.timespanNs)
}

object ArchivePolicy {
  /** Valid base methods (gnocchi/archive_policy.py:39-46): the named ones
    * plus 1pct..99pct, each optionally `rate:`-prefixed.
    */
  val basicMethods: Set[String] = {
    val named =
      Set("mean", "sum", "last", "max", "min", "std", "median", "first", "count")
    val pct = (1 to 99).map(n => s"${n}pct").toSet
    val base = named ++ pct
    base ++ base.map("rate:" + _)
  }

  val defaultMethods: Set[String] = Set("mean", "min", "max", "sum", "std", "count")

  /** Resolve the `*` / `+x` / `-x` method-set algebra
    * (gnocchi/archive_policy.py:116-142).
    */
  def resolveMethods(spec: Set[String]): Set[String] = {
    val adds = spec.filter(_.startsWith("+")).map(_.drop(1))
    val subs = spec.filter(_.startsWith("-")).map(_.drop(1))
    val plain = spec.filterNot(s =>
      s.startsWith("+") || s.startsWith("-") || s == "*")
    // the -/+ loop applies AFTER expanding `*` too (archive_policy.py:
    // 116-133): ["*", "-mean"] materializes everything except mean
    val base =
      if (spec.contains("*")) basicMethods
      else if (plain.nonEmpty) plain
      else defaultMethods
    (base ++ adds) -- subs
  }

  import Granularity.{seconds => sec}
  /** Default policies (gnocchi/archive_policy.py:266-305). */
  val defaults: Map[String, ArchivePolicy] = Map(
    // bool keeps a 3600-granule back window (archive_policy.py:267-274)
    "bool" -> ArchivePolicy("bool", 3600,
      Seq(ArchivePolicyItem(sec(1), None, Some(365L * 86400 * 1_000_000_000L))),
      Set("last")),
    "low" -> ArchivePolicy("low", 0,
      Seq(ArchivePolicyItem(sec(300), None, Some(30L * 86400 * 1_000_000_000L))),
      defaultMethods),
    "medium" -> ArchivePolicy("medium", 0,
      Seq(
        ArchivePolicyItem(sec(60), None, Some(7L * 86400 * 1_000_000_000L)),
        ArchivePolicyItem(sec(3600), None, Some(365L * 86400 * 1_000_000_000L))),
      defaultMethods),
    "high" -> ArchivePolicy("high", 0,
      Seq(
        ArchivePolicyItem(sec(1), None, Some(3600L * 1_000_000_000L)),
        ArchivePolicyItem(sec(60), None, Some(7L * 86400 * 1_000_000_000L)),
        ArchivePolicyItem(sec(3600), None, Some(365L * 86400 * 1_000_000_000L))),
      defaultMethods))
}
