package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

class BetweennessSpec extends SparkSpec {

  private def graph(edges: Seq[(Long, Long)]): TemporalGraph =
    TemporalGraph.fromTriples(spark, edges.zipWithIndex.map { case ((s, d), i) => (s, d, i.toLong) })

  private val fixture = Seq[(Long, Long)](
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (2, 5), (3, 4), (3, 5), (3, 6), (4, 3), (4, 2), (4, 4))

  test("Brandes golden, unnormalized (centrality.rs:14-44)") {
    val got = Betweenness.run(spark, graph(fixture))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Map(1L -> 0.0, 2L -> 1.0, 3L -> 4.0, 4L -> 1.0, 5L -> 0.0, 6L -> 0.0)
    expected.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v")
    }
  }

  test("Brandes golden, normalized (centrality.rs:46-60)") {
    val got = Betweenness.run(spark, graph(fixture), normalized = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Map(1L -> 0.0, 2L -> 0.05, 3L -> 0.2, 4L -> 0.05, 5L -> 0.0, 6L -> 0.0)
    expected.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v")
    }
  }
}
