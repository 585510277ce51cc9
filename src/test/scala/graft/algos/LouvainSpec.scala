package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

/**
 * Louvain: deterministic distributed variant of the reference
 * (community_detection/louvain.rs + modularity.rs). The reference's own
 * tests only assert assignment coverage (its rng makes outputs
 * irreproducible); here we additionally pin determinism, planted-community
 * recovery, and the modularity function itself.
 */
class LouvainSpec extends SparkSpec {

  private def graphOf(edges: Seq[(Long, Long)]): TemporalGraph = {
    import spark.implicits._
    TemporalGraph(
      edges.zipWithIndex
        .map { case ((s, d), i) => (s, d, i.toLong, i.toLong, "_default") }
        .toDF("src", "dst", "ts", "event_id", "layer"))
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { i <- ids; j <- ids if i < j } yield (i, j)

  private def communitiesOf(assign: Array[org.apache.spark.sql.Row]): Set[Set[Long]] =
    assign
      .groupBy(_.getAs[Long]("community"))
      .values
      .map(_.map(_.getAs[Long]("id")).toSet)
      .toSet

  test("two cliques joined by a bridge are recovered as communities") {
    val edges = clique(Seq(1L, 2L, 3L, 4L, 5L)) ++ clique(Seq(10L, 11L, 12L, 13L, 14L)) ++
      Seq((5L, 10L))
    val g = graphOf(edges)
    val result = Louvain.run(spark, g).collect()
    val coms = communitiesOf(result)
    assert(
      coms == Set(Set(1L, 2L, 3L, 4L, 5L), Set(10L, 11L, 12L, 13L, 14L)),
      s"got $coms")
    // canonical labels = min member id
    assert(result.forall(r =>
      r.getAs[Long]("community") == 1L || r.getAs[Long]("community") == 10L))
  }

  test("deterministic across runs") {
    val edges = clique(Seq(1L, 2L, 3L)) ++ clique(Seq(7L, 8L, 9L)) ++
      Seq((3L, 7L), (1L, 9L), (2L, 20L), (20L, 21L), (21L, 22L), (22L, 20L))
    val g = graphOf(edges)
    val a = Louvain.run(spark, g).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Louvain.run(spark, g).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("modularity matches hand-computed values (reference value(), modularity.rs:391)") {
    import spark.implicits._
    // single edge, both nodes in one community: e=2 (both perspectives),
    // m2=2, ktot^2=4 -> Q = 2/2 - 4/4 = 0
    val g1 = graphOf(Seq((1L, 2L)))
    val together = Seq((1L, 1L), (2L, 1L)).toDF("id", "community")
    assert(math.abs(Louvain.modularityOf(spark, g1, together) - 0.0) < 1e-12)
    // single edge, separate communities: e=0, ktots 1,1 -> Q = 0 - 2/4 = -0.5
    val apart = Seq((1L, 1L), (2L, 2L)).toDF("id", "community")
    assert(math.abs(Louvain.modularityOf(spark, g1, apart) - (-0.5)) < 1e-12)
    // two triangles + bridge, triangles as communities:
    // pairs w=1 each; m2 = sum k = 2*7 = 14 (6 triangle edges + bridge)
    // e = 2*6 = 12; ktot per com: nodes {1,2,3}: k=2,2,3 -> 7; same other -> 7
    // Q = 12/14 - (49+49)/196 = 6/7 - 1/2 = 5/14
    val g2 = graphOf(clique(Seq(1L, 2L, 3L)) ++ clique(Seq(4L, 5L, 6L)) ++ Seq((3L, 4L)))
    val split = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "community")
    assert(math.abs(Louvain.modularityOf(spark, g2, split) - 5.0 / 14.0) < 1e-12)
  }

  test("result modularity beats singletons and the one-big-community partition") {
    import spark.implicits._
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) ++
      clique(Seq(9L, 10L, 11L)) ++ Seq((4L, 5L), (8L, 9L))
    val g = graphOf(edges)
    val result = Louvain.run(spark, g)
    val q = Louvain.modularityOf(spark, g, result)
    val ids = result.collect().map(_.getAs[Long]("id")).toSeq
    val singletons = ids.map(i => (i, i)).toDF("id", "community")
    val allOne = ids.map(i => (i, 1L)).toDF("id", "community")
    val qS = Louvain.modularityOf(spark, g, singletons)
    val qA = Louvain.modularityOf(spark, g, allOne)
    assert(q > qS && q > qA, s"q=$q singletons=$qS allOne=$qA")
    assert(q > 0.3, s"q=$q")
  }

  test("weighted edges steer the partition (reference weighted fixture shape)") {
    import spark.implicits._
    // strong edge 1-2 (w=10), weak edges to 3: Louvain must group 1,2
    val df = Seq(
      (1L, 2L, 0L, 0L, "_default", 10.0),
      (2L, 3L, 1L, 1L, "_default", 0.5),
      (3L, 4L, 2L, 2L, "_default", 10.0))
      .toDF("src", "dst", "ts", "event_id", "layer", "weight")
    val g = TemporalGraph(df)
    val coms = communitiesOf(
      Louvain.run(spark, g, Louvain.Config(weightCol = Some("weight"))).collect())
    assert(coms == Set(Set(1L, 2L), Set(3L, 4L)), s"got $coms")
  }

  test("all nodes assigned on an arbitrary digraph (reference coverage test)") {
    val edges = Seq((100L, 200L), (100L, 300L), (200L, 300L), (300L, 400L),
      (400L, 500L), (600L, 800L), (700L, 900L), (100L, 600L))
    val g = graphOf(edges ++ edges.map(_.swap))
    val result = Louvain.run(spark, g).collect()
    val ids = result.map(_.getAs[Long]("id")).toSet
    assert(ids == Set(100L, 200L, 300L, 400L, 500L, 600L, 700L, 800L, 900L))
    assert(result.forall(r => !r.isNullAt(1)))
  }
}
