package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph
import org.apache.spark.sql.functions._

class IndependentSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L
  private def hOf(seed: Long, id: Long): Long = {
    val s = ((seed % P) + P) % P
    (s + (((id % P) + P) % P) * 73856093L % P) % P
  }

  private def graphOf(edges: Seq[(Long, Long)]) =
    TemporalGraph(
      edges.toDF("src", "dst")
        .withColumn("ts", lit(0L))
        .withColumn("event_id", monotonically_increasing_id())
        .withColumn("layer", lit("_d")))

  private val randEdges: Seq[(Long, Long)] = {
    def h(a: Long, b: Long): Long = (a * 73856093L + b * 19349663L + 11L) % 1000003L
    (for {
      i <- 0L until 60L
      k <- 0 until 3
      j = h(i, k.toLong) % 60L
      if j != i
    } yield (i, j)).distinct
  }

  private def undOf(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] =
    edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .withDefaultValue(Set.empty[Long])

  private def nodesOf(edges: Seq[(Long, Long)]): Seq[Long] =
    edges.flatMap(e => Seq(e._1, e._2)).distinct

  test("MIS equals the sequential greedy along ascending (h, id); independent and maximal") {
    val g = graphOf(randEdges)
    val got = Independent.maximalIndependentSet(spark, g, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val und = undOf(randEdges)
    val order = nodesOf(randEdges).sortBy(v => (hOf(42L, v), v))
    var mis = Set.empty[Long]
    order.foreach(v => if (!und(v).exists(mis)) mis += v)
    assert(got.filter(_._2).keySet == mis)
    // independence + maximality directly
    mis.foreach(v => assert(und(v).intersect(mis).isEmpty, s"adjacent in-MIS pair at $v"))
    nodesOf(randEdges).foreach(v =>
      assert(mis.contains(v) || und(v).exists(mis), s"$v excluded without an in-MIS neighbour"))
  }

  test("MIS: partition invariance and early convergence metrics") {
    val df = randEdges.toDF("src", "dst")
      .withColumn("ts", lit(0L))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("layer", lit("_d"))
    val a = Independent.maximalIndependentSet(spark, graphOf(randEdges), seed = 7L)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val b = Independent.maximalIndependentSet(spark, TemporalGraph(df.repartition(7)), seed = 7L)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(a == b)
  }

  test("JP coloring equals the sequential greedy mex coloring; proper") {
    val g = graphOf(randEdges)
    val got = Independent.jonesPlassmann(spark, g, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = undOf(randEdges)
    val order = nodesOf(randEdges).sortBy(v => (hOf(42L, v), v))
    var color = Map.empty[Long, Long]
    order.foreach { v =>
      val used = und(v).flatMap(color.get)
      color += v -> Iterator.from(0).map(_.toLong).filterNot(used).next()
    }
    assert(got == color)
    // proper coloring
    randEdges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      assert(got(a) != got(b), s"edge ($a,$b) monochromatic")
    }
  }

  test("JP: triangle needs 3 colors, star needs 2, isolates-by-self-loop get 0") {
    val tri = graphOf(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val triC = Independent.jonesPlassmann(spark, tri).collect().map(_.getLong(1)).toSet
    assert(triC == Set(0L, 1L, 2L))
    val star = graphOf((2L to 6L).map(1L -> _) :+ (7L -> 7L))
    val starC = Independent.jonesPlassmann(spark, star)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starC(7L) == 0L) // self-loop-only node: no undirected neighbours
    (2L to 6L).foreach(v => assert(starC(v) != starC(1L)))
    assert(starC.values.toSet.size == 2)
  }

  test("MIS and JP are ANSI-total on full-range ids") {
    val big = graphOf(Seq(
      (8724135602145789301L, -6550931074891523407L),
      (-6550931074891523407L, 4403912876510430269L),
      (4403912876510430269L, 8724135602145789301L)))
    val mis = Independent.maximalIndependentSet(spark, big)
      .collect().map(r => r.getBoolean(1))
    assert(mis.count(identity) == 1) // triangle: exactly one in MIS
    val jp = Independent.jonesPlassmann(spark, big).collect().map(_.getLong(1)).toSet
    assert(jp == Set(0L, 1L, 2L))
  }

  test("MIS and JP throw on non-convergence instead of returning truncated state") {
    // a path whose nodes are chained in ASCENDING priority order needs
    // ~depth rounds (each round decides only the head of the undecided
    // suffix) — the worst case for both algorithms. Built from the same
    // hash the algorithms use, so the ordering is exact, not probabilistic.
    val ordered = (1L to 24L).sortBy(id => (hOf(42L, id), id))
    val path = ordered.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
    val g = graphOf(path)
    val eMis = intercept[IllegalStateException] {
      Independent.maximalIndependentSet(spark, g, maxRounds = 2, seed = 42L)
    }
    assert(eMis.getMessage.contains("did not converge"))
    val eJp = intercept[IllegalStateException] {
      Independent.jonesPlassmann(spark, g, maxRounds = 2, seed = 42L)
    }
    assert(eJp.getMessage.contains("did not converge"))
    // with headroom the same graph completes and the coloring is total
    val colors = Independent.jonesPlassmann(spark, g, maxRounds = 64, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(colors.size == 24 && colors.values.forall(_ >= 0L))
    path.foreach { case (a, b) => assert(colors(a) != colors(b)) }
  }
}
