package graft.graph

import graft.SparkSpec

import java.time.{LocalDateTime, ZoneOffset}

/**
 * Calendar alignment goldens ported from the reference's
 * python/tests/test_base_install/test_graphdb/test_rolling_expanding_alignment.py
 * (same event times: 2025-03-15 14:37:52, 2025-07-08 09:12:05,
 * 2025-11-22 21:45:30).
 */
class AlignedWindowsSpec extends SparkSpec {

  private def ms(y: Int, mo: Int, d: Int, h: Int = 0, mi: Int = 0, s: Int = 0): Long =
    LocalDateTime.of(y, mo, d, h, mi, s).toInstant(ZoneOffset.UTC).toEpochMilli

  private def exampleGraph: TemporalGraph = {
    val ts = Seq(ms(2025, 3, 15, 14, 37, 52), ms(2025, 7, 8, 9, 12, 5), ms(2025, 11, 22, 21, 45, 30))
    TemporalGraph.fromTriples(spark, ts.map(t => (1L, 1L, t)))
  }

  test("rolling('1 month') aligns to month starts (test_rolling_month_alignment_default_true)") {
    val w = exampleGraph.rollingAligned(TimeInterval.months(1))
    assert(w.head._1 == ms(2025, 3, 1) && w.head._2 == ms(2025, 4, 1))
    assert(w(1)._1 == ms(2025, 4, 1) && w(1)._2 == ms(2025, 5, 1))
    assert(w(2)._1 == ms(2025, 5, 1) && w(2)._2 == ms(2025, 6, 1))
    assert(w.last._1 == ms(2025, 11, 1) && w.last._2 == ms(2025, 12, 1))
  }

  test("rolling('1 day') aligns to day starts (test_rolling_day_alignment_default_true)") {
    val w = exampleGraph.rollingAligned(TimeInterval.days(1))
    assert(w.head._1 == ms(2025, 3, 15) && w.head._2 == ms(2025, 3, 16))
    assert(w(1)._1 == ms(2025, 3, 16) && w(1)._2 == ms(2025, 3, 17))
    assert(w.last._1 == ms(2025, 11, 22) && w.last._2 == ms(2025, 11, 23))
  }

  test("rolling('1 month and 1 day'): day alignment, multiply-first cursor " +
    "(test_rolling_month_and_day_alignment_default_true)") {
    val iv = TimeInterval.months(1).and(TimeInterval.days(1))
    val w = exampleGraph.rollingAligned(iv)
    assert(w.head._1 == ms(2025, 3, 15) && w.head._2 == ms(2025, 4, 16))
    assert(w(1)._1 == ms(2025, 4, 16) && w(1)._2 == ms(2025, 5, 17))
    assert(w(2)._1 == ms(2025, 5, 17) && w(2)._2 == ms(2025, 6, 18))
    assert(w.last._1 == ms(2025, 10, 22) && w.last._2 == ms(2025, 11, 23))
  }

  test("rolling('1 month', step='1 day'): smallest unit wins " +
    "(test_rolling_alignment_smallest_of_window_and_step)") {
    val w = exampleGraph.rollingAligned(TimeInterval.months(1), Some(TimeInterval.days(1)))
    assert(w.head._1 == ms(2025, 2, 16) && w.head._2 == ms(2025, 3, 16))
    assert(w(1)._1 == ms(2025, 2, 17) && w(1)._2 == ms(2025, 3, 17))
    assert(w(2)._1 == ms(2025, 2, 18) && w(2)._2 == ms(2025, 3, 18))
    assert(w.last._1 == ms(2025, 10, 23) && w.last._2 == ms(2025, 11, 23))
  }

  test("discrete ms interval stays unaligned (test_rolling_no_alignment_for_discrete_ms)") {
    val w = exampleGraph.rollingAligned(TimeInterval.discrete(86400000L))
    assert(w.head._1 == ms(2025, 3, 15, 14, 37, 52))
    assert(w.head._2 == ms(2025, 3, 16, 14, 37, 52))
    assert(w.last._1 == ms(2025, 11, 22, 14, 37, 52))
  }

  test("expanding('1 month') ends at aligned month boundaries") {
    val w = exampleGraph.expandingAligned(TimeInterval.months(1))
    assert(w.head._1 == ms(2025, 4, 1))
    assert(w(1)._1 == ms(2025, 5, 1))
    assert(w.last._1 == ms(2025, 12, 1))
    // view contents: first expanding window holds only the March event
    assert(w.head._2.countTemporalEdges() == 1L)
    assert(w.last._2.countTemporalEdges() == 3L)
  }

  test("week alignment buckets are epoch-aligned (test_week_alignment_epoch_buckets)") {
    // epoch (1970-01-01) was a Thursday; week floors are multiples of 7 days
    val t = ms(2025, 3, 15, 14, 37, 52)
    val aligned = AlignmentUnit.Week.align(t)
    assert(aligned % 604800000L == 0L)
    assert(aligned <= t && t - aligned < 604800000L)
  }
}
