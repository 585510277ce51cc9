package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

import scala.util.Random

/**
 * Triangle-count golden (reference doc example,
 * raphtory/src/algorithms/motifs/triangle_count.rs:40-61: 11 edges → 4
 * triangles) + brute-force model checks on random graphs.
 */
class TrianglesSpec extends SparkSpec {

  private def graph(edges: Seq[(Long, Long)]): TemporalGraph =
    TemporalGraph.fromTriples(spark, edges.zipWithIndex.map { case ((s, d), i) => (s, d, i.toLong) })

  private def modelCount(edges: Seq[(Long, Long)]): Long = {
    val und = edges
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .toSet
    val nbrs = und
      .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val nodes = nbrs.keys.toSeq.sorted
    nodes.combinations(3).count {
      case Seq(a, b, c) =>
        und((a, b)) && und((b, c)) && und((a, c))
      case _ => false
    }
  }

  test("doc example: 4 triangles (triangle_count.rs:40-61)") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (7, 8), (8, 9), (9, 7), (8, 10), (10, 9))
    assert(Triangles.globalCount(spark, graph(edges)) == 4L)
  }

  test("self-loops and multi-edges are ignored") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (1, 1), (2, 2), (1, 2), (2, 1), (3, 1))
    assert(Triangles.globalCount(spark, graph(edges)) == 1L)
  }

  test("local counts: each node of a triangle participates once") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (3, 4))
    val local = Triangles
      .localCounts(spark, graph(edges))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("random graphs match brute-force model") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(150) {
        ((rnd.nextInt(30) + 1).toLong, (rnd.nextInt(30) + 1).toLong)
      }
      val expected = modelCount(edges)
      val got = Triangles.globalCount(spark, graph(edges))
      assert(got == expected, s"trial $trial: got $got want $expected")
    }
  }
}
