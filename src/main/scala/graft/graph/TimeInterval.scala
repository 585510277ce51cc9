package graft.graph

import java.time.{Instant, ZoneOffset}

/**
 * Calendar-aware window intervals — the Spark counterpart of the
 * reference's `Interval`/`AlignmentUnit`
 * (raphtory-core/src/utils/time.rs:16-133, 380-460):
 *
 *  - an interval is (millis, months); `k * interval` multiplies both
 *    components FIRST, then applies once (Jan 31 + 2·(1 month) lands on
 *    Mar 31, not Mar 28 — matching the reference's `counter * step`);
 *  - `t + interval` adds calendar months first, then millis; `t − interval`
 *    subtracts millis first, then months (the reference's Add/Sub pairing,
 *    guaranteeing t + i − i = t);
 *  - the alignment unit is the SMALLEST unit mentioned when intervals
 *    combine (time.rs:386 takes the min), with month/year floored on the
 *    UTC calendar and day/week/etc. floored on epoch multiples
 *    (week buckets are epoch-aligned, i.e. Thursday starts).
 */
sealed abstract class AlignmentUnit(val rank: Int) {
  def align(ts: Long): Long
}

object AlignmentUnit {
  private val MsSecond = 1000L
  private val MsMinute = 60L * MsSecond
  private val MsHour = 60L * MsMinute
  private val MsDay = 24L * MsHour
  private val MsWeek = 7L * MsDay

  private def floorMs(ts: Long, unit: Long): Long = ts - java.lang.Math.floorMod(ts, unit)

  case object Unaligned extends AlignmentUnit(0) { def align(ts: Long): Long = ts }
  case object Millisecond extends AlignmentUnit(1) { def align(ts: Long): Long = ts }
  case object Second extends AlignmentUnit(2) { def align(ts: Long): Long = floorMs(ts, MsSecond) }
  case object Minute extends AlignmentUnit(3) { def align(ts: Long): Long = floorMs(ts, MsMinute) }
  case object Hour extends AlignmentUnit(4) { def align(ts: Long): Long = floorMs(ts, MsHour) }
  case object Day extends AlignmentUnit(5) { def align(ts: Long): Long = floorMs(ts, MsDay) }
  case object Week extends AlignmentUnit(6) { def align(ts: Long): Long = floorMs(ts, MsWeek) }
  case object Month extends AlignmentUnit(7) {
    def align(ts: Long): Long =
      Instant.ofEpochMilli(ts).atZone(ZoneOffset.UTC).toLocalDate
        .withDayOfMonth(1).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
  }
  case object Year extends AlignmentUnit(8) {
    def align(ts: Long): Long =
      Instant.ofEpochMilli(ts).atZone(ZoneOffset.UTC).toLocalDate
        .withDayOfYear(1).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
  }

  /** Combining intervals keeps the smaller unit (time.rs:386). */
  def min(a: AlignmentUnit, b: AlignmentUnit): AlignmentUnit = if (a.rank <= b.rank) a else b
}

final case class TimeInterval(millis: Long, months: Int, alignment: AlignmentUnit) {

  def *(k: Int): TimeInterval = TimeInterval(millis * k, months * k, alignment)

  /** t + interval: calendar months first, then millis (time.rs:422-447). */
  def addTo(t: Long): Long =
    if (months == 0) t + millis
    else
      Instant.ofEpochMilli(t).atZone(ZoneOffset.UTC)
        .plusMonths(months.toLong).toInstant.toEpochMilli + millis

  /** t − interval: millis first, then months (time.rs:397-420). */
  def subtractFrom(t: Long): Long =
    if (months == 0) t - millis
    else
      Instant.ofEpochMilli(t - millis).atZone(ZoneOffset.UTC)
        .minusMonths(months.toLong).toInstant.toEpochMilli

  /** Combine ("1 month and 1 day"): sizes add, alignment takes the
    * smaller unit. */
  def and(other: TimeInterval): TimeInterval =
    TimeInterval(
      millis + other.millis,
      months + other.months,
      AlignmentUnit.min(alignment, other.alignment))
}

object TimeInterval {
  /** Discrete epoch-millis interval — never aligned (the reference treats
    * raw numbers as Discrete; test_rolling_no_alignment_for_discrete_ms). */
  def discrete(ms: Long): TimeInterval = TimeInterval(ms, 0, AlignmentUnit.Unaligned)

  def milliseconds(n: Long): TimeInterval = TimeInterval(n, 0, AlignmentUnit.Millisecond)
  def seconds(n: Long): TimeInterval = TimeInterval(n * 1000L, 0, AlignmentUnit.Second)
  def minutes(n: Long): TimeInterval = TimeInterval(n * 60000L, 0, AlignmentUnit.Minute)
  def hours(n: Long): TimeInterval = TimeInterval(n * 3600000L, 0, AlignmentUnit.Hour)
  def days(n: Long): TimeInterval = TimeInterval(n * 86400000L, 0, AlignmentUnit.Day)
  def weeks(n: Long): TimeInterval = TimeInterval(n * 604800000L, 0, AlignmentUnit.Week)
  def months(n: Int): TimeInterval = TimeInterval(0, n, AlignmentUnit.Month)
  def years(n: Int): TimeInterval = TimeInterval(0, 12 * n, AlignmentUnit.Year)
}
