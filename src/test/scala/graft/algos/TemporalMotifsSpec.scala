package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph
import org.apache.spark.sql.functions._

/**
 * Golden tests against the reference's motif fixtures
 * (raphtory/tests/algo_tests/motifs.rs test_global; kernel unit fixtures
 * in three_node_motifs.rs).
 */
class TemporalMotifsSpec extends SparkSpec {

  /** The reference fixture: (t, src, dst) add_edge calls; event_id is the
    * insertion index (the reference's auto-incremented secondary index). */
  private val fixtureEdges = Seq[(Long, Long, Long)](
    (1, 1, 1), (1, 1, 1), (2, 1, 1), (1, 1, 2), (1, 1, 2), (2, 1, 3), (2, 1, 3),
    (3, 1, 4), (4, 3, 1), (5, 3, 4), (6, 3, 5), (7, 4, 5), (8, 5, 6), (9, 5, 8),
    (10, 7, 5), (11, 8, 5), (12, 1, 9), (13, 9, 1), (14, 6, 3), (15, 4, 8),
    (16, 8, 3), (17, 5, 10), (18, 10, 5), (19, 10, 8), (20, 1, 11), (21, 11, 1),
    (22, 9, 11), (23, 11, 9))

  private def fixtureGraph: TemporalGraph = {
    import spark.implicits._
    TemporalGraph(
      fixtureEdges.zipWithIndex
        .map { case ((t, s, d), i) => (s, d, t, i.toLong, "_default") }
        .toDF("src", "dst", "ts", "event_id", "layer"))
  }

  test("global 40-dim census matches the reference golden (motifs.rs test_global, delta=10)") {
    val got = TemporalMotifs
      .global(spark, fixtureGraph, deltaMs = 10)
      .orderBy("motif_id")
      .collect()
      .map(_.getAs[Long]("count"))
    val expected = Array[Long](
      0, 2, 3, 8, 2, 4, 1, 5, 0, 0, 0, 0, 1, 0, 2, 0, 0, 1, 6, 0, 0, 1, 10, 2,
      0, 1, 0, 0, 0, 0, 1, 0, 2, 3, 2, 4, 1, 2, 4, 1)
    assert(got.toSeq == expected.toSeq)
  }

  test("two-node kernel fixture (three_node_motifs.rs two_node_test)") {
    // events: OUT@1, IN@2, IN@3, delta 5
    val c = TemporalMotifs.twoNodeCounts(Array(1L, 2L, 3L), Array(1, 0, 0), 5L)
    // one 3-event sequence (O,I,I) → map3d(1,0,0) = 4
    assert(c.sum == 1 && c(4) == 1, s"got ${c.toSeq}")
  }

  test("triangle kernel fixture (three_node_motifs.rs triad_test semantics)") {
    // (uv_edge, uorv, dir, time): (true,0,1,1), (false,1,1,2), (false,0,0,3)
    val c = TemporalMotifs.triangleCounts(
      Array(1L, 2L, 3L),
      Array(true, false, false),
      Array(0, 1, 0),
      Array(1, 1, 0),
      5L)
    // the uv edge at t=1 sees both w-edges in its post window:
    // finalCounts[3] += postSum(map3d(1,1,0)) = 1 (uv-first triangle motif)
    assert(c(3) == 1 && c.sum == 1, s"got ${c.toSeq}")
  }

  /** The local-test sample graph (motifs.rs local_motifs_test
    * load_sample_graph) — differs from the global fixture: the (1,1,2) and
    * (2,1,3) edges are NOT duplicated. */
  private val localFixtureEdges = Seq[(Long, Long, Long)](
    (1, 1, 1), (1, 1, 1), (2, 1, 1), (1, 1, 2), (2, 1, 3), (3, 1, 4), (4, 3, 1),
    (5, 3, 4), (6, 3, 5), (7, 4, 5), (8, 5, 6), (9, 5, 8), (10, 7, 5),
    (11, 8, 5), (12, 1, 9), (13, 9, 1), (14, 6, 3), (15, 4, 8), (16, 8, 3),
    (17, 5, 10), (18, 10, 5), (19, 10, 8), (20, 1, 11), (21, 11, 1),
    (22, 9, 11), (23, 11, 9))

  test("local per-node census matches the reference golden (motifs.rs test_local_motif, delta=10)") {
    import spark.implicits._
    val g = TemporalGraph(
      localFixtureEdges.zipWithIndex
        .map { case ((t, s, d), i) => (s, d, t, i.toLong, "_default") }
        .toDF("src", "dst", "ts", "event_id", "layer"))
    val got = TemporalMotifs
      .local(spark, g, deltaMs = 10)
      .collect()
      .groupBy(_.getAs[Long]("id"))
      .map { case (id, rows) =>
        val v = new Array[Long](40)
        rows.foreach(r => v(r.getAs[Int]("motif_id")) = r.getAs[Long]("count"))
        id -> v.toSeq
      }
    val expected = Map[Long, Seq[Long]](
      1L -> Seq(0, 0, 0, 0, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 2, 0, 0, 0, 3, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 2, 0),
      10L -> Seq(0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1),
      11L -> Seq(0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 1, 0),
      2L -> Seq.fill(40)(0L),
      3L -> Seq(0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 2, 0, 1, 2, 0),
      4L -> Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 0, 1, 2, 0),
      5L -> Seq(0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 4, 0, 0, 0, 3, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 1, 3, 0, 1, 1, 1),
      6L -> Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0),
      7L -> Seq.fill(40)(0L),
      8L -> Seq(0, 0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 1, 2, 0, 1, 0, 1),
      9L -> Seq(0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 1, 0))
    assert(got.keySet == expected.keySet, s"node sets differ: ${got.keySet}")
    expected.foreach { case (id, exp) =>
      assert(got(id) == exp, s"node $id: got ${got(id)} expected $exp")
    }
  }

  test("delta windows restrict the census") {
    // with delta=1 only tight sequences survive; census must shrink
    val wide = TemporalMotifs.global(spark, fixtureGraph, 10)
      .agg(sum("count")).first().getLong(0)
    val tight = TemporalMotifs.global(spark, fixtureGraph, 1)
      .agg(sum("count")).first().getLong(0)
    assert(tight < wide)
    assert(tight >= 0)
  }
}
