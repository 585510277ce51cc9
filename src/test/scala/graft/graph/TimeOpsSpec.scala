package graft.graph

import graft.SparkSpec

/**
 * TimeOps completeness vs the reference trait (time.rs:93-262):
 * shrink_start/shrink_end/shrink_window clamp and never widen, window
 * reports its bounds verbatim, latest() is `at(latest_time)`,
 * snapshot_at ≡ before(t+1) and snapshot_latest is a no-op for
 * event-semantics graphs, and cacheView materializes the filter chain.
 */
class TimeOpsSpec extends SparkSpec {

  private def g: TemporalGraph =
    TemporalGraph.fromTriples(
      spark,
      Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L), (4L, 5L, 40L), (5L, 6L, 50L)))

  test("window reports bounds verbatim; start/end/window_size") {
    val w = g.window(15, 45)
    assert(w.start.contains(15L) && w.end.contains(45L))
    assert(w.windowSize.contains(30L))
    assert(g.start.isEmpty && g.end.isEmpty && g.windowSize.isEmpty)
    assert(w.countTemporalEdges() == 3) // ts 20, 30, 40
  }

  test("shrink_start clamps to max(start, current) and never widens") {
    val w = g.window(15, 45)
    assert(w.shrinkStart(25).start.contains(25L))
    assert(w.shrinkStart(5).start.contains(15L)) // never widens
    assert(w.shrinkStart(5).countTemporalEdges() == 3)
    assert(w.shrinkStart(25).countTemporalEdges() == 2) // 30, 40
    // unbounded view: shrink simply sets the bound
    assert(g.shrinkStart(25).start.contains(25L))
    assert(g.shrinkStart(25).countTemporalEdges() == 3)
  }

  test("shrink_end clamps to min(end, current); shrink_window does both") {
    val w = g.window(15, 45)
    assert(w.shrinkEnd(35).end.contains(35L))
    assert(w.shrinkEnd(55).end.contains(45L)) // never widens
    assert(w.shrinkEnd(35).countTemporalEdges() == 2) // 20, 30
    val s = w.shrinkWindow(5, 35)
    assert(s.start.contains(15L) && s.end.contains(35L))
    assert(s.countTemporalEdges() == 2)
  }

  test("latest() is at(latest_time); snapshot semantics for event graphs") {
    val l = g.latest()
    assert(l.start.contains(50L) && l.end.contains(51L))
    assert(l.countTemporalEdges() == 1)
    assert(g.snapshotAt(30).countTemporalEdges() == 3) // inclusive
    assert(g.snapshotAt(30).end.contains(31L))
    assert(g.snapshotLatest().countTemporalEdges() == g.countTemporalEdges())
    // empty view: latest() leaves the view unchanged
    val empty = g.window(100, 200)
    assert(empty.latest().countTemporalEdges() == 0)
  }

  test("edgeHistory: per-edge sorted event times, capped with honest stats") {
    // edge (1,2) has 4 events, (2,3) one
    val multi = TemporalGraph.fromTriples(
      spark,
      Seq((1L, 2L, 40L), (1L, 2L, 10L), (1L, 2L, 30L), (1L, 2L, 20L), (2L, 3L, 5L)))
    val full = multi.edgeHistory().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(full((1L, 2L)).getSeq[Long](2) == Seq(10L, 20L, 30L, 40L))
    assert(full((1L, 2L)).getLong(3) == 10L && full((1L, 2L)).getLong(4) == 40L)
    assert(full((1L, 2L)).getLong(5) == 4L && !full((1L, 2L)).getBoolean(6))
    // capped at 2: array keeps the EARLIEST two, stats keep full multiplicity
    val capped = multi.edgeHistory(maxEvents = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(capped((1L, 2L)).getSeq[Long](2) == Seq(10L, 20L))
    assert(capped((1L, 2L)).getLong(4) == 40L && capped((1L, 2L)).getLong(5) == 4L)
    assert(capped((1L, 2L)).getBoolean(6))
    assert(!capped((2L, 3L)).getBoolean(6))
    // stats-only path agrees
    val stats = multi.edgeHistoryStats.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(stats((1L, 2L)).getLong(2) == 10L && stats((1L, 2L)).getLong(3) == 40L)
    assert(stats((1L, 2L)).getLong(4) == 4L)
  }

  test("cacheView materializes the composed filters and is releasable") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val cached = g.window(15, 45).layer("_default").cacheView()
    assert(cached.countTemporalEdges() == 3)
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    cached.uncacheView()
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }
}
