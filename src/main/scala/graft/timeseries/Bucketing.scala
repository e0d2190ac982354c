package graft.timeseries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.Granularity

/** Time-bucketing: the GROUP BY of the measure plane.
  *
  * Fixed-granularity flooring mirrors `round_timestamp`
  * (reference gnocchi/carbonara.py:68-70): `epoch + floor((ts - epoch) /
  * freq) * freq`. Calendar buckets mirror gnocchi/calendar.py:95-100.
  *
  * All expressions are pure Catalyst `Column`s — they stay inside
  * whole-stage codegen and push down to the scan where applicable.
  */
object Bucketing {

  /** Floor a timestamp column to a fixed granularity (ns resolution,
    * µs-accurate on TimestampType — the tested surface of the reference
    * is µs-aligned, see SURVEY §7.4).
    */
  def floorTimestamp(ts: Column, granularityNs: Long): Column = {
    require(granularityNs % 1000 == 0,
      s"sub-microsecond granularity (${granularityNs}ns) cannot align " +
        "to microsecond timestamps")
    if (granularityNs % 1_000_000_000L == 0) {
      val gs = granularityNs / 1_000_000_000L
      timestamp_seconds(floor(unix_timestamp(ts) / gs) * gs)
    } else {
      // INTEGER floor via pmod (non-negative remainder): `/` on columns
      // is double division, and at epoch-µs magnitude a double ulp is
      // ~0.25 µs — boundary buckets could land one granule off
      val gus = granularityNs / 1000L // µs granularity
      timestamp_micros(unix_micros(ts) - pmod(unix_micros(ts), lit(gus)))
    }
  }

  /** Calendar bucket starts (gnocchi/calendar.py):
    *   Y = year start, H = half-year start, Q = quarter start,
    *   M = month start, W = week start anchored Sunday (calendar.py:40-44).
    */
  def calendarBucket(ts: Column, unit: String): Column = unit match {
    case "Y" => date_trunc("year", ts)
    case "Q" => date_trunc("quarter", ts)
    case "M" => date_trunc("month", ts)
    case "H" =>
      // half-year: Jan 1 or Jul 1
      to_timestamp(
        concat(year(ts).cast("string"),
          when(month(ts) <= 6, lit("-01-01")).otherwise(lit("-07-01"))))
    case "W" =>
      // week anchored Sunday: dayofweek is 1 (Sun) .. 7 (Sat);
      // date_sub already yields a day-truncated DATE — the cast to
      // timestamp is the whole midnight-anchoring
      date_sub(ts, dayofweek(ts) - 1).cast("timestamp")
    case other => throw new IllegalArgumentException(s"calendar unit $other")
  }

  def bucket(ts: Column, g: Granularity): Column = g match {
    case Granularity.Fixed(ns)      => floorTimestamp(ts, ns)
    case Granularity.Calendar(unit) => calendarBucket(ts, unit)
  }

  /** Calendar *labels* (gnocchi/calendar.py:24-87) — scalar date parts. */
  def calendarLabel(ts: Column, name: String): Column = name match {
    case "month_of_year"    => month(ts)
    case "iso_week_of_year" => weekofyear(ts)
    // reference is 0-based: (D - Y).astype(int) with no +1 (calendar.py:52-54)
    case "day_of_year"      => dayofyear(ts) - 1
    case "day_of_month"     => dayofmonth(ts)
    case "day_of_week"      => dayofweek(ts) - 1 // reference: Sunday=0 .. Saturday=6
    case "quarter_of_year"  => quarter(ts)
    case "half_of_year"     => when(month(ts) <= 6, 1).otherwise(2)
    case other => throw new IllegalArgumentException(s"calendar label $other")
  }
}
