package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph
import org.apache.spark.sql.functions._

class CentralitySpec extends SparkSpec {
  import spark.implicits._

  private def graphOf(edges: Seq[(Long, Long)]) =
    TemporalGraph(
      edges.toDF("src", "dst")
        .withColumn("ts", lit(0L))
        .withColumn("event_id", monotonically_increasing_id())
        .withColumn("layer", lit("_d")))

  /** plain-Scala sup-norm power iteration on Aᵀ (distinct edges) */
  private def eigModel(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int): Map[Long, Double] = {
    val e = edges.distinct
    var x = nodes.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val recv = nodes.map(v => v -> e.collect { case (u, w) if w == v => x(u) }.sum).toMap
      val mx = recv.values.max
      val d = if (mx == 0.0) 1.0 else mx
      x = recv.view.mapValues(_ / d).toMap
    }
    x
  }

  private def katzModel(
      edges: Seq[(Long, Long)], nodes: Seq[Long],
      alpha: Double, beta: Double, iters: Int): Map[Long, Double] = {
    val e = edges.distinct
    var x = nodes.map(_ -> beta).toMap
    (1 to iters).foreach { _ =>
      x = nodes.map(v => v -> (beta + alpha * e.collect { case (u, w) if w == v => x(u) }.sum)).toMap
    }
    x
  }

  // deterministic pseudo-random digraph: 40 nodes, ~120 edges
  private val randEdges: Seq[(Long, Long)] = {
    def h(a: Long, b: Long): Long = (a * 73856093L + b * 19349663L + 7L) % 1000003L
    (for {
      i <- 0L until 40L
      k <- 0 until 3
      j = h(i, k.toLong) % 40L
      if j != i
    } yield (i, j)).distinct
  }
  private val randNodes = randEdges.flatMap(e => Seq(e._1, e._2)).distinct.sorted

  test("eigenvector matches the dense power-iteration model on a random digraph") {
    val g = graphOf(randEdges)
    val got = Centrality.eigenvector(spark, g, Centrality.Config(maxIter = 15, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = eigModel(randEdges, randNodes, 15)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) => assert(math.abs(s - want(id)) < 1e-9, s"node $id: $s vs ${want(id)}") }
  }

  test("eigenvector: in-star mass concentrates on the 0↔1 cycle; leaves decay to 0") {
    // 1..5 → 0 plus a 0 → 1 back-edge: the only recurrent part is the
    // period-2 cycle {0, 1}, so scores alternate between its two phases —
    // one of {0, 1} reads exactly 1 (the sup-norm pin), the other 0.2
    // (after step 1 only leaf 1 still feeds 0: recv(0) = x(1) = 0.2·max)
    val edges = (1L to 5L).map(_ -> 0L) :+ (0L -> 1L)
    val g = graphOf(edges)
    val got = Centrality.eigenvector(spark, g, Centrality.Config(maxIter = 30, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Set(got(0L), got(1L)) == Set(1.0, 0.2))
    (2L to 5L).foreach(v => assert(got(v) < 1e-6, s"source leaf $v should decay"))
  }

  test("eigenvector is invariant to CSR shard size") {
    val g = graphOf(randEdges)
    val a = Centrality.eigenvector(spark, g, Centrality.Config(maxIter = 8, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Centrality.eigenvector(spark, g, Centrality.Config(maxIter = 8, tol = 0.0, maxShard = 2))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, s) => assert(math.abs(s - b(id)) < 1e-12) }
  }

  test("eigenvector tol mode stops at the fixpoint") {
    // 2-cycle: converges immediately under sup-norm
    val g = graphOf(Seq((1L, 2L), (2L, 1L)))
    val got = Centrality.eigenvector(spark, g, Centrality.Config(maxIter = 50, tol = 1e-9))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 1.0))
  }

  test("katz matches the dense model and the 2-node closed form") {
    val g = graphOf(randEdges)
    val got = Centrality.katz(spark, g, alpha = 0.05, beta = 1.0,
      Centrality.Config(maxIter = 12, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = katzModel(randEdges, randNodes, 0.05, 1.0, 12)
    got.foreach { case (id, s) => assert(math.abs(s - want(id)) < 1e-9, s"node $id") }

    // chain 1→2: x(1) = β forever; x(2) = β + α·β after convergence
    val g2 = graphOf(Seq((1L, 2L)))
    val k2 = Centrality.katz(spark, g2, alpha = 0.2, beta = 1.0,
      Centrality.Config(maxIter = 10, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(k2(1L) - 1.0) < 1e-12)
    assert(math.abs(k2(2L) - 1.2) < 1e-12)
  }

  test("katz rejects out-of-range alpha") {
    val g = graphOf(Seq((1L, 2L)))
    intercept[IllegalArgumentException] {
      Centrality.katz(spark, g, alpha = 1.0, beta = 1.0)
    }
  }
}
