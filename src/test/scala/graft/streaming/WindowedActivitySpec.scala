package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files
import java.sql.Timestamp

// top-level, not nested in the spec: an inner case class needs the outer
// test instance, so its encoder falls back from codegen to interpreter
// (WARN noise in every suite run)
private[streaming] case class WaEdge(src: Long, dst: Long, ts: Timestamp)

class WindowedActivitySpec extends SparkSpec {

  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z, minute-aligned
  private def e(src: Long, dst: Long, sec: Long) =
    WaEdge(src, dst, new Timestamp(t0 + sec * 1000L))

  test("per-node sliding windows emit once the watermark passes, with correct counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[WaEdge]
    val ckpt = Files.createTempDirectory("graft-winact-ckpt").toString

    val act = WindowedActivity.nodeActivity(
      source.toDF(), window = "1 minute", slide = "1 minute", lateness = "10 seconds")
    val q = act.writeStream
      .format("memory")
      .queryName("winact_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    // minute 0: 1→2, 1→3, 2→1; minute 1: 1→2
    source.addData(e(1, 2, 0), e(1, 3, 20), e(2, 1, 40), e(1, 2, 70))
    q.processAllAvailable()
    // advance the watermark far past both windows to flush them
    source.addData(e(9, 9, 600))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("winact_out")
      .select("w_start", "id", "events", "out_events", "approx_neighbours")
      .as[(Timestamp, Long, Long, Long, Long)]
      .collect()
      .map { case (w, id, ev, out, nb) => ((w.getTime - t0) / 60000L, id) -> (ev, out, nb) }
      .toMap

    // node 1 in minute 0: events 1→2, 1→3, 2→1 → 3 incident, 2 out, nbrs {2,3}
    assert(rows((0L, 1L)) == ((3L, 2L, 2L)), s"node1/min0: ${rows.get((0L, 1L))}")
    // node 2 in minute 0: 1→2 (in), 2→1 (out) → 2 incident, 1 out, nbr {1}
    assert(rows((0L, 2L)) == ((2L, 1L, 1L)), s"node2/min0: ${rows.get((0L, 2L))}")
    // node 3 in minute 0: one in-event from 1
    assert(rows((0L, 3L)) == ((1L, 0L, 1L)), s"node3/min0: ${rows.get((0L, 3L))}")
    // minute 1 has exactly the 1→2 edge
    assert(rows((1L, 1L)) == ((1L, 1L, 1L)) && rows((1L, 2L)) == ((1L, 0L, 1L)))
  }

  test("late data within the watermark updates its window; edgeRate counts per window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[WaEdge]
    val ckpt = Files.createTempDirectory("graft-winrate-ckpt").toString

    val rate = WindowedActivity.edgeRate(
      source.toDF(), window = "1 minute", lateness = "2 minutes")
    val q = rate.writeStream
      .format("memory")
      .queryName("winrate_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    source.addData(e(1, 2, 0), e(2, 3, 30), e(3, 4, 70))
    q.processAllAvailable()
    // an out-of-order event for minute 0, still inside the 2-minute lateness
    source.addData(e(5, 6, 10))
    q.processAllAvailable()
    // flush
    source.addData(e(9, 9, 900))
    q.processAllAvailable()
    q.stop()

    val byMin = spark.table("winrate_out")
      .select("w_start", "edges")
      .as[(Timestamp, Long)]
      .collect()
      .map { case (w, n) => (w.getTime - t0) / 60000L -> n }
      .toMap
    assert(byMin(0L) == 3L, s"minute 0 must include the late event: $byMin")
    assert(byMin(1L) == 1L, s"minute 1: $byMin")
  }
}
