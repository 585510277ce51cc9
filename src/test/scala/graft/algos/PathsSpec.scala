package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

class PathsSpec extends SparkSpec {

  private def graph(edges: Seq[(Long, Long)]): TemporalGraph =
    TemporalGraph.fromTriples(spark, edges.zipWithIndex.map { case ((s, d), i) => (s, d, i.toLong) })

  test("SSSP BFS levels with cutoff") {
    // 1 → 2 → 3 → 4, plus shortcut 1 → 3
    val g = graph(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)))
    val got = Paths
      .sssp(spark, g, source = 1L, cutoff = 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Long](2)))
      .toMap
    assert(got(1L)._1 == 0 && got(2L)._1 == 1 && got(3L)._1 == 1 && got(4L)._1 == 2)
    assert(got(4L)._2 == Seq(1L, 3L, 4L))
    assert(got.size == 4)
    // cutoff respected
    val cut = Paths.sssp(spark, g, 1L, cutoff = 1).collect().map(_.getLong(0)).toSet
    assert(cut == Set(1L, 2L, 3L))
  }

  test("weighted SSSP relaxes through cheaper long path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = Seq(
      (1L, 2L, 10.0), (1L, 3L, 1.0), (3L, 2L, 1.0), (2L, 4L, 1.0))
      .toDF("src", "dst", "w")
      .withColumn("ts", lit(0L)).withColumn("event_id", lit(0L)).withColumn("layer", lit("_d"))
    val g = TemporalGraph(edges)
    val got = Paths
      .weightedSssp(spark, g, 1L, "w")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(got == Map(1L -> 0.0, 3L -> 1.0, 2L -> 2.0, 4L -> 3.0))
  }

  /** The reference Dijkstra fixture (algo_tests/pathing.rs basic_graph,
    * node-id variant): A..F = 1..6 with the same weights. */
  private def dijkstraGraph = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = Seq(
      (1L, 2L, 4.0), (1L, 3L, 4.0), (2L, 3L, 2.0), (3L, 4L, 3.0),
      (3L, 5L, 1.0), (3L, 6L, 6.0), (4L, 6L, 2.0), (5L, 6L, 3.0))
      .toDF("src", "dst", "weight")
      .withColumn("ts", lit(0L)).withColumn("event_id", lit(0L)).withColumn("layer", lit("_d"))
    TemporalGraph(edges)
  }

  test("dijkstra: weighted, targets, paths (pathing.rs test_dijkstra_multiple_targets)") {
    def run(src: Long, targets: Seq[Long]) = Paths
      .dijkstra(spark, dijkstraGraph, src, Some(targets), Some("weight"), "out")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Long](2).toSeq))
      .toMap
    val fromA = run(1L, Seq(4L, 6L))
    assert(fromA(4L) == ((7.0, Seq(1L, 3L, 4L))))
    assert(fromA(6L) == ((8.0, Seq(1L, 3L, 5L, 6L))))
    assert(fromA.size == 2, "only requested targets returned")
    val fromB = run(2L, Seq(4L, 5L, 6L))
    assert(fromB(4L) == ((5.0, Seq(2L, 3L, 4L))))
    assert(fromB(5L) == ((3.0, Seq(2L, 3L, 5L))))
    assert(fromB(6L) == ((6.0, Seq(2L, 3L, 5L, 6L))))
  }

  test("dijkstra: default weight 1 (pathing.rs test_dijkstra_no_weight)") {
    val got = Paths
      .dijkstra(spark, dijkstraGraph, 1L, Some(Seq(3L, 5L, 6L)), None, "out")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toSeq)
      .toMap
    assert(got(3L) == Seq(1L, 3L))
    assert(got(5L) == Seq(1L, 3L, 5L))
    assert(got(6L) == Seq(1L, 3L, 6L))
  }

  test("dijkstra: direction in and both") {
    // in-direction from 6: shortest reverse path to 1 via 4 or 5
    val in6 = Paths
      .dijkstra(spark, dijkstraGraph, 6L, None, Some("weight"), "in")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(in6(3L) == 4.0) // 6←5(3)+5←3(1)
    assert(in6(1L) == 8.0)
    // both: 2 reaches 1 through the undirected 1-2 edge
    val both2 = Paths
      .dijkstra(spark, dijkstraGraph, 2L, None, Some("weight"), "both")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(both2(1L) == 4.0)
  }

  test("temporal reachability respects event time ordering") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 1→2 at t=10, 2→3 at t=5 (BEFORE taint reaches 2 ⇒ 3 unreachable),
    // 2→4 at t=20 (after ⇒ reachable)
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 5L), (2L, 4L, 20L))
      .toDF("src", "dst", "ts")
      .withColumn("event_id", lit(0L)).withColumn("layer", lit("_d"))
    val g = TemporalGraph(edges)
    val got = Paths
      .temporalReachability(spark, g, Seq((1L, 0L)))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 0L, 2L -> 10L, 4L -> 20L))
  }

  test("in/out components and LCC") {
    val g = graph(Seq((1L, 2L), (2L, 3L), (4L, 2L), (10L, 11L)))
    val out = Components.outComponent(spark, g, 1L).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L))
    val in = Components.inComponent(spark, g, 3L).collect().map(_.getLong(0)).toSet
    assert(in == Set(3L, 2L, 1L, 4L))
    val lcc = Components.largestConnectedComponent(spark, g)
    assert(lcc.nodes.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
  }
}
