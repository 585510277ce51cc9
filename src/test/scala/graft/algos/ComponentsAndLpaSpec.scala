package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

import scala.util.Random

/**
 * WCC golden + model-based tests (reference:
 * raphtory/tests/algo_tests/components.rs; connected_components.rs doc
 * example) and LPA two-community golden
 * (tests/algo_tests/community_detection.rs:28-70).
 */
class ComponentsAndLpaSpec extends SparkSpec {

  private def graph(edges: Seq[(Long, Long)]): TemporalGraph =
    TemporalGraph.fromTriples(spark, edges.zipWithIndex.map { case ((s, d), i) => (s, d, i.toLong) })

  private def wcc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .run(spark, graph(edges))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  /** In-memory union–find model, mirrors the reference's AUnionFind. */
  private def modelWcc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("WCC: doc example + isolated pairs (components.rs:107, lcc.rs tests)") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 1), (3, 1), (10, 11), (20, 21), (30, 31))
    val got = wcc(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("WCC: long path with scrambled ids converges in O(log n) rounds") {
    // A 500-node path whose ids are NOT ordered along the path — plain min
    // propagation needs ~500 supersteps here; star contraction must finish
    // within the 20-round cap.
    def scramble(i: Long): Long = { var x = i * 0x9E3779B97F4A7C15L; x ^= (x >>> 32); x & 0x7FFFFFFFFFFFFFFFL }
    val edges = (0L until 499L).map(i => (scramble(i), scramble(i + 1)))
    val got = ConnectedComponents.run(spark, graph(edges), ConnectedComponents.Config(maxIter = 20))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minId = (0L to 499L).map(scramble).min
    assert(got.size == 500)
    assert(got.values.toSet == Set(minId))
  }

  test("WCC: random graphs match union–find model (components.rs:215-243)") {
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val n = 50 + rnd.nextInt(100)
      val edges = Seq.fill(n) {
        ((rnd.nextInt(60) + 1).toLong, (rnd.nextInt(60) + 1).toLong)
      }
      assert(wcc(edges) == modelWcc(edges), s"trial $trial failed")
    }
  }

  test("whole-graph in/out components = per-node reachability sets (in_components.rs:68)") {
    // diamond with a cycle tail: 1→2, 1→3, 2→4, 3→4, 4→5, 5→4
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 4))
    val g = graph(edges)
    def collectComp(direction: String): Map[Long, Seq[Long]] =
      Components.allComponents(spark, g, direction)
        .collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[scala.collection.Seq[Long]]("members").toSeq)
        .toMap
    val in = collectComp("in")
    assert(in(1L) == Seq.empty)
    assert(in(4L) == Seq(1L, 2L, 3L, 4L, 5L), "cycle puts 4 in its own in-component")
    assert(in(5L) == Seq(1L, 2L, 3L, 4L, 5L))
    val out = collectComp("out")
    assert(out(1L) == Seq(2L, 3L, 4L, 5L))
    assert(out(4L) == Seq(4L, 5L))
    assert(out(5L) == Seq(4L, 5L))
  }

  test("LPA: two communities (community_detection.rs:28-70)") {
    // Exact reference fixture with ids in the reference's VID insertion
    // order: R1=0 R2=1 R3=2 G=3 B1=4 B2=5 B3=6 B4=7 B5=8 — so the label
    // dynamics (init label = index, max-label tie-break) match one-to-one.
    val edges = Seq[(Long, Long)](
      (0, 1), (0, 2), (1, 2), // R1-R2, R1-R3, R2-R3
      (2, 3), // R3-G
      (3, 4), (3, 6), // G-B1, G-B3
      (4, 5), (5, 6), (5, 7), (6, 7), (6, 8), (7, 8))
    val labels = LabelPropagation
      .run(spark, graph(edges), LabelPropagation.Config(maxIter = 20))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val partitions = labels.groupBy(_._2).values.map(_.keySet).toSet
    assert(
      partitions.contains(Set(0L, 1L, 2L)) && partitions.contains(Set(3L, 4L, 5L, 6L, 7L, 8L)),
      s"got partitions $partitions")
  }
}
