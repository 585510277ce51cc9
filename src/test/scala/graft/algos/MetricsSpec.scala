package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph
import org.apache.spark.sql.functions._

/**
 * Goldens ported from the reference metrics tests
 * (/root/reference/raphtory/tests/algo_tests/metrics.rs, centrality.rs,
 * cores.rs).
 */
class MetricsSpec extends SparkSpec {

  private def graph(edges: Seq[(Long, Long)]): TemporalGraph =
    TemporalGraph.fromTriples(spark, edges.zipWithIndex.map { case ((s, d), i) => (s, d, i.toLong) })

  test("global clustering coefficient = 0.3 (metrics.rs:13-48)") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 1), (2, 6), (2, 7), (3, 1), (3, 4), (3, 7), (4, 1),
      (4, 3), (4, 5), (4, 6), (5, 4), (5, 6), (6, 4), (6, 5), (6, 2), (7, 2), (7, 3))
    val g = graph(edges)
    assert(Metrics.tripletCount(g) == 20L)
    assert(Triangles.globalCount(spark, g) == 2L)
    assert(math.abs(Metrics.globalClusteringCoefficient(spark, g) - 0.3) < 1e-12)
  }

  test("global + local reciprocity (metrics.rs:323-364)") {
    val edges = Seq[(Long, Long)]((1, 2), (1, 4), (2, 3), (3, 2), (3, 1), (4, 3), (4, 1), (1, 5))
    val g = graph(edges)
    assert(math.abs(Metrics.globalReciprocity(g) - 0.5) < 1e-12)
    val local = Metrics
      .localReciprocity(g)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val expected = Map(1L -> 0.4, 2L -> 2.0 / 3.0, 3L -> 0.5, 4L -> 2.0 / 3.0, 5L -> 0.0)
    expected.foreach { case (k, v) =>
      assert(math.abs(local(k) - v) < 1e-5, s"node $k: ${local(k)} vs $v")
    }
  }

  test("degree centrality (centrality.rs test_degree_centrality)") {
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (1, 4), (2, 3), (2, 4))
    val got = Metrics
      .degreeCentrality(graph(edges))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    val expected = Map(1L -> 1.0, 2L -> 1.0, 3L -> 2.0 / 3.0, 4L -> 2.0 / 3.0)
    expected.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-5) }
  }

  test("directed density = 1.0 on a reciprocal pair (metrics.rs density test)") {
    assert(math.abs(Metrics.directedDensity(graph(Seq((1L, 2L), (2L, 1L)))) - 1.0) < 1e-12)
  }

  test("degree stats over the 6-edge degree example (degree.rs:22-44)") {
    // graph: 1→1 (self), 1→2, 1→3, 2→1, 3→2, 4→2  — distinct-neighbour semantics
    val edges = Seq[(Long, Long)]((1, 1), (1, 2), (1, 3), (2, 1), (3, 2), (4, 2))
    val stats = Metrics.degreeStats(graph(edges)).first()
    assert(stats.getAs[Long]("max_out_degree") == 3L) // node 1: {1,2,3}
    assert(stats.getAs[Long]("max_in_degree") == 3L)  // node 2: {1,3,4}
    assert(stats.getAs[Long]("min_out_degree") == 1L) // every node has an out-edge here
    assert(stats.getAs[Long]("min_in_degree") == 0L)  // node 4
  }

  test("balance: net event weights per node (balance.rs semantics)") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L, 10.0), (1L, 2L, 5.0), // repeated event counts twice (temporal)
      (2L, 3L, 7.0), (3L, 1L, 2.0))
      .toDF("src", "dst", "w")
      .withColumn("ts", lit(0L))
      .withColumn("event_id", lit(0L))
      .withColumn("layer", lit("_default"))
    val g = TemporalGraph(edges)
    val got = Metrics.balance(g, "w", "both").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> (2.0 - 15.0), 2L -> (15.0 - 7.0), 3L -> (7.0 - 2.0)))
  }

  test("k-core 2 (cores.rs k_core_2)") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (3, 1), (3, 4), (3, 5), (4, 5), (5, 6), (5, 8), (7, 5),
      (8, 5), (1, 9), (9, 1), (6, 3), (4, 8), (8, 3), (5, 10), (10, 5), (10, 8), (1, 11),
      (11, 1), (9, 11), (11, 9))
    val core = KCore
      .coreSet(spark, graph(edges), KCore.Config(k = 2))
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(core == Set(1L, 3L, 4L, 5L, 6L, 8L, 9L, 10L, 11L))
  }

  test("coreness: h-index fixpoint equals brute-force peel at every k") {
    // K4 {1,2,3,4} (coreness 3), triangle {5,6,7} bridged to it (2),
    // pendant 8 (1)
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (5, 6), (6, 7), (5, 7), (4, 5), (1, 8))
    val g = graph(edges)
    val got = KCore.coreness(spark, g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 2L, 6L -> 2L, 7L -> 2L, 8L -> 1L))
    // coreness >= k must reproduce every peel's k-core set
    (1 to 3).foreach { k =>
      val fromCoreness = got.filter(_._2 >= k).keySet
      val peel = KCore.coreSet(spark, g, KCore.Config(k = k))
        .collect().map(_.getLong(0)).toSet
      assert(fromCoreness == peel, s"k=$k")
    }
    // and on the reference k_core_2 fixture
    val edges2 = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (3, 1), (3, 4), (3, 5), (4, 5), (5, 6), (5, 8), (7, 5),
      (8, 5), (1, 9), (9, 1), (6, 3), (4, 8), (8, 3), (5, 10), (10, 5), (10, 8), (1, 11),
      (11, 1), (9, 11), (11, 9))
    val c2 = KCore.coreness(spark, graph(edges2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2.filter(_._2 >= 2L).keySet == Set(1L, 3L, 4L, 5L, 6L, 8L, 9L, 10L, 11L))
  }

  test("HITS 8-node golden (centrality.rs:81-137, f32 reference @1e-3)") {
    val edges = Seq[(Long, Long)](
      (1, 4), (2, 3), (2, 5), (3, 1), (4, 2), (4, 3), (5, 2), (5, 3), (5, 4), (5, 6),
      (6, 3), (6, 8), (7, 1), (7, 3), (8, 1))
    val got = Hits
      .run(spark, graph(edges), Hits.Config(maxIter = 20))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val expected = Map[Long, (Double, Double)](
      1L -> (0.0431365, 0.096625775), 2L -> (0.14359662, 0.18366566),
      3L -> (0.030866561, 0.36886504), 4L -> (0.1865414, 0.12442485),
      5L -> (0.26667944, 0.05943252), 6L -> (0.14359662, 0.10755368),
      7L -> (0.15471625, 0.0), 8L -> (0.030866561, 0.05943252))
    expected.foreach { case (k, (h, a)) =>
      assert(math.abs(got(k)._1 - h) < 1e-3, s"hub $k: ${got(k)._1} vs $h")
      assert(math.abs(got(k)._2 - a) < 1e-3, s"auth $k: ${got(k)._2} vs $a")
    }
  }

  test("conductance: brute-force parity on a two-cluster fixture") {
    import spark.implicits._
    // K3 {1,2,3} and K3 {4,5,6} joined by one bridge 3-4, plus isolate 7
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4), (7, 7))
    val g = graph(edges)
    val labels = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L), (6L, 20L), (7L, 30L))
      .toDF("id", "label")
    val got = Metrics.conductance(g, labels).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap

    // brute force: canonical undirected edges, no self-loops
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val lab = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val m2 = deg.values.sum
    for (l <- Seq(10L, 20L, 30L)) {
      val members = lab.collect { case (id, ll) if ll == l => id }.toSet
      val vol = members.toSeq.map(deg).sum
      val cut = und.count { case (a, b) => members.contains(a) != members.contains(b) }.toLong
      val den = math.min(vol, m2 - vol)
      val phi = if (den > 0) cut.toDouble / den else 0.0
      val (gn, gv, gc, gp) = got(l)
      assert(gn == members.size.toLong, s"n_nodes $l")
      assert(gv == vol, s"volume $l")
      assert(gc == cut, s"cut $l")
      assert(math.abs(gp - math.rint(phi * 1e6) / 1e6) < 1e-12, s"conductance $l")
    }
    // the two cliques each see exactly the bridge: cut 1, vol 7 (3+2+2... )
    assert(got(10L)._3 == 1L && got(20L)._3 == 1L)
    assert(got(30L) == ((1L, 0L, 0L, 0.0))) // isolate: zero volume, phi 0
  }
}
