package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PersistentGraphSpec extends SparkSpec {

  import spark.implicits._

  private def events(rows: Seq[(Long, Long, Long, Long)]) =
    rows.toDF("src", "dst", "ts", "event_id").withColumn("layer", lit("_d"))

  test("alive_before: last addition must beat last deletion (persistent_semantics.rs:31-64)") {
    val adds = events(Seq(
      (1L, 2L, 10L, 0L), // added at 10
      (1L, 2L, 30L, 0L), // re-added at 30
      (3L, 4L, 10L, 0L))) // never deleted
    val dels = events(Seq(
      (1L, 2L, 20L, 0L), // deleted at 20
      (5L, 6L, 10L, 0L))) // deletion without addition: never alive
    val pg = PersistentGraph(TemporalGraph(adds), dels)

    def alive(t: Long): Set[(Long, Long)] =
      pg.aliveBefore(t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(alive(10) == Set.empty) // nothing before 10
    assert(alive(15) == Set((1L, 2L), (3L, 4L)))
    assert(alive(25) == Set((3L, 4L))) // 1→2 deleted at 20
    assert(alive(35) == Set((1L, 2L), (3L, 4L))) // re-added at 30
    assert(pg.valid().simpleEdges.count() == 2)
  }

  test("same-timestamp tie broken by event_id (EventTime order)") {
    val adds = events(Seq((1L, 2L, 10L, 5L)))
    val delsWins = events(Seq((1L, 2L, 10L, 6L))) // same ts, later event id
    val delsLoses = events(Seq((1L, 2L, 10L, 4L)))
    assert(PersistentGraph(TemporalGraph(adds), delsWins).aliveBefore(11).count() == 0)
    assert(PersistentGraph(TemporalGraph(adds), delsLoses).aliveBefore(11).count() == 1)
  }

  test("snapshotAt includes events exactly at the cut") {
    val adds = events(Seq((1L, 2L, 10L, 0L)))
    val pg = PersistentGraph(TemporalGraph(adds), events(Seq.empty))
    assert(pg.snapshotAt(10).countEdges() == 1)
    assert(pg.snapshotAt(9).countEdges() == 0)
  }
}
