package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

/**
 * Golden PageRank vectors ported from the reference test suite
 * (/root/reference/raphtory/tests/algo_tests/centrality.rs:140-311).
 */
class PageRankSpec extends SparkSpec {

  private def ranks(edges: Seq[(Long, Long)], cfg: PageRank.Config): Map[Long, Double] = {
    val g = TemporalGraph.fromTriples(spark, edges.zipWithIndex.map { case ((s, d), i) => (s, d, i.toLong) })
    PageRank
      .run(spark, g, cfg)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
  }

  private def assertClose(actual: Map[Long, Double], expected: Map[Long, Double], tol: Double): Unit = {
    assert(actual.keySet == expected.keySet, s"node sets differ: ${actual.keySet} vs ${expected.keySet}")
    expected.foreach { case (k, v) =>
      assert(math.abs(actual(k) - v) < tol, s"node $k: got ${actual(k)}, want $v (tol $tol)")
    }
  }

  test("4-node cycle (centrality.rs:140-160)") {
    val edges = Seq[(Long, Long)]((1, 2), (1, 4), (2, 3), (3, 1), (4, 1))
    val expected = Map[Long, Double](1L -> 0.38694, 2L -> 0.20195, 3L -> 0.20916, 4L -> 0.20195)
    assertClose(ranks(edges, PageRank.Config(maxIter = 1000, useL2Norm = true)), expected, 1e-5)
  }

  test("11-node motif graph (centrality.rs:163-216)") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (3, 1), (3, 4), (3, 5), (4, 5), (5, 6), (5, 8), (7, 5),
      (8, 5), (1, 9), (9, 1), (6, 3), (4, 8), (8, 3), (5, 10), (10, 5), (10, 8), (1, 11),
      (11, 1), (9, 11), (11, 9))
    val expected = Map[Long, Double](
      10L -> 0.072082, 8L -> 0.136473, 3L -> 0.15484, 6L -> 0.07208, 11L -> 0.06186,
      2L -> 0.03557, 1L -> 0.11284, 4L -> 0.07944, 7L -> 0.01638, 9L -> 0.06186,
      5L -> 0.19658)
    assertClose(ranks(edges, PageRank.Config(maxIter = 1000, useL2Norm = true)), expected, 1e-5)
  }

  test("2-node swap, L1 (centrality.rs:219-237)") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 1))
    val expected = Map[Long, Double](1L -> 0.5, 2L -> 0.5)
    assertClose(ranks(edges, PageRank.Config(maxIter = 1000, useL2Norm = false)), expected, 1e-3)
  }

  test("3-node one dangling, 10 iters, L1 (centrality.rs:240-261)") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 1), (2, 3))
    val expected = Map[Long, Double](1L -> 0.303, 2L -> 0.393, 3L -> 0.303)
    assertClose(ranks(edges, PageRank.Config(maxIter = 10, useL2Norm = false)), expected, 1e-3)
  }

  test("dangling chain, L2 (centrality.rs:263-311)") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (2, 3), (3, 1), (3, 2), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
      (8, 9), (9, 10), (10, 11))
    val expected = Map[Long, Double](
      1L -> 0.055, 2L -> 0.079, 3L -> 0.113, 4L -> 0.055, 5L -> 0.070, 6L -> 0.083,
      7L -> 0.093, 8L -> 0.102, 9L -> 0.110, 10L -> 0.117, 11L -> 0.122)
    assertClose(ranks(edges, PageRank.Config(maxIter = 1000, useL2Norm = true)), expected, 1e-3)
  }

  test("multi-edges collapse: duplicate edges don't change scores") {
    val base = Seq[(Long, Long)]((1, 2), (1, 4), (2, 3), (3, 1), (4, 1))
    val dup = base ++ base ++ Seq[(Long, Long)]((1, 2), (2, 3))
    val expected = Map[Long, Double](1L -> 0.38694, 2L -> 0.20195, 3L -> 0.20916, 4L -> 0.20195)
    assertClose(ranks(dup, PageRank.Config(maxIter = 1000, useL2Norm = true)), expected, 1e-5)
  }

  test("personalized: all-nodes seed set degenerates to standard PageRank") {
    import spark.implicits._
    val edges = Seq[(Long, Long)]((1, 2), (1, 4), (2, 3), (3, 1), (4, 1))
    val g = TemporalGraph.fromTriples(
      spark, edges.zipWithIndex.map { case ((s, d), i) => (s, d, i.toLong) })
    val cfg = PageRank.Config(maxIter = 50, tol = 0.0)
    val std = PageRank.run(spark, g, cfg).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ppr = PageRank
      .personalized(spark, g, Seq(1L, 2L, 3L, 4L).toDF("id"), cfg)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(std.keySet == ppr.keySet)
    std.foreach { case (k, v) => assert(math.abs(ppr(k) - v) < 1e-12, s"node $k") }
  }

  test("personalized: mass conserved and confined to the seed component") {
    import spark.implicits._
    // two disjoint cycles; seed only in the first
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10))
    val g = TemporalGraph.fromTriples(
      spark, edges.zipWithIndex.map { case ((s, d), i) => (s, d, i.toLong) })
    val ppr = PageRank
      .personalized(spark, g, Seq(1L).toDF("id"), PageRank.Config(maxIter = 60, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ppr.values.sum - 1.0) < 1e-9, s"total mass ${ppr.values.sum}")
    assert(ppr(10L) == 0.0 && ppr(11L) == 0.0 && ppr(12L) == 0.0)
    // seed holds the largest score (teleport returns mass to it every step)
    assert(ppr(1L) > ppr(2L) && ppr(1L) > ppr(3L))
  }

  test("weighted: all-1 weights degenerate exactly to unweighted PageRank") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = Seq[(Long, Long)]((1, 2), (1, 4), (2, 3), (3, 1), (4, 1), (4, 5))
    val g = TemporalGraph.fromTriples(
      spark, edges.zipWithIndex.map { case ((a, b), i) => (a, b, i.toLong) })
    val w1 = edges.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w")
    val cfg = PageRank.Config(maxIter = 15, tol = 0.0)
    val weighted = PageRank.weighted(spark, g, w1, cfg)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = PageRank.run(spark, g, cfg)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(weighted.keySet == plain.keySet)
    weighted.foreach { case (id, v) => assert(math.abs(v - plain(id)) < 1e-12, s"node $id") }
  }

  test("weighted: matches the dense weighted model and shifts mass toward heavy edges") {
    import spark.implicits._
    // 1 -> {2 (w 3), 3 (w 1)}; 2 -> 1; 3 -> 1
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (2, 1), (3, 1))
    val wts = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val g = TemporalGraph.fromTriples(
      spark, edges.zipWithIndex.map { case ((a, b), i) => (a, b, i.toLong) })
    val got = PageRank.weighted(
      spark, g, wts.toDF("src", "dst", "w"), PageRank.Config(maxIter = 20, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val nodes = Seq(1L, 2L, 3L)
    val outW = wts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var x = nodes.map(_ -> 1.0 / 3).toMap
    (1 to 20).foreach { _ =>
      val sink = 0.0 // no sinks here
      x = nodes.map { v =>
        val recv = wts.collect { case (u, vv, w) if vv == v => x(u) * w / outW(u) }.sum
        v -> (0.15 / 3 + 0.85 * recv + 0.85 / 3 * sink)
      }.toMap
    }
    got.foreach { case (id, v) => assert(math.abs(v - x(id)) < 1e-9, s"node $id") }
    assert(got(2L) > got(3L)) // the heavy edge pulls mass to 2
  }
}
