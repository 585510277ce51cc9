package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private def graphOf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    TemporalGraph(
      edges.zipWithIndex
        .map { case ((s, d), i) => (s, d, 10L * i, i.toLong, "a") }
        .toDF("src", "dst", "ts", "event_id", "layer"))
  }

  private def positions(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  private def dist(a: (Double, Double), b: (Double, Double)): Double =
    math.hypot(a._1 - b._1, a._2 - b._2)

  /** Plain-Scala reference model of the same physics (reference
    * update_positions semantics in double precision). */
  private def modelStep(
      pos: Map[Long, (Double, Double)],
      vel: Map[Long, (Double, Double)],
      nbrs: Map[Long, Set[Long]],
      scale: Double, cooloff: Double, dt: Double)
      : (Map[Long, (Double, Double)], Map[Long, (Double, Double)]) = {
    val ids = pos.keySet
    val newVel = ids.map { i =>
      val (xi, yi) = pos(i)
      var fx = 0.0; var fy = 0.0
      for (j <- ids if j != i) {
        val (xj, yj) = pos(j)
        val d = math.hypot(xi - xj, yi - yj)
        if (d > 0) { fx += scale * scale * (xi - xj) / (d * d); fy += scale * scale * (yi - yj) / (d * d) }
      }
      for (j <- nbrs.getOrElse(i, Set.empty)) {
        val (xj, yj) = pos(j)
        val d = math.hypot(xi - xj, yi - yj)
        if (d > 0) { fx += (xj - xi) * d / scale; fy += (yj - yi) * d / scale }
      }
      val (vx, vy) = vel(i)
      i -> (((vx + fx * dt) * cooloff), ((vy + fy * dt) * cooloff))
    }.toMap
    val newPos = ids.map { i =>
      val (x, y) = pos(i); val (vx, vy) = newVel(i)
      i -> ((x + vx * dt), (y + vy * dt))
    }.toMap
    (newPos, newVel)
  }

  test("exact mode matches the plain-Scala model from the same deterministic init") {
    val g = graphOf(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    val cfg0 = Layout.Config(iterations = 0, exact = true)
    val init = positions(Layout.fruchtermanReingold(spark, g, cfg0))
    assert(init.size == 4)
    // determinism of the hash init
    assert(init == positions(Layout.fruchtermanReingold(spark, g, cfg0)))

    val nbrs = Map(
      1L -> Set(2L, 3L), 2L -> Set(1L, 3L), 3L -> Set(1L, 2L, 4L), 4L -> Set(3L))
    var pos = init
    var vel: Map[Long, (Double, Double)] = init.map { case (k, _) => k -> (0.0, 0.0) }
    for (_ <- 1 to 5) {
      val (p, v) = modelStep(pos, vel, nbrs, scale = 1.0, cooloff = 0.975, dt = 0.1)
      pos = p; vel = v
    }
    val got = positions(
      Layout.fruchtermanReingold(spark, g, cfg0.copy(iterations = 5)))
    for (id <- pos.keys) {
      assert(math.abs(got(id)._1 - pos(id)._1) < 1e-9, s"x of $id")
      assert(math.abs(got(id)._2 - pos(id)._2) < 1e-9, s"y of $id")
    }
  }

  test("grid mode with one giant cell degenerates to the exact computation") {
    val g = graphOf(Seq((1L, 2L), (2L, 3L), (4L, 5L), (1L, 5L)))
    val exact = positions(Layout.fruchtermanReingold(
      spark, g, Layout.Config(iterations = 8, exact = true)))
    val grid = positions(Layout.fruchtermanReingold(
      spark, g, Layout.Config(iterations = 8, exact = false, cellSize = 1e6)))
    for (id <- exact.keys) {
      assert(math.abs(exact(id)._1 - grid(id)._1) < 1e-9)
      assert(math.abs(exact(id)._2 - grid(id)._2) < 1e-9)
    }
  }

  test("attraction pulls linked nodes together, repulsion separates components") {
    val g = graphOf(Seq((1L, 2L), (3L, 4L)))
    val p = positions(Layout.fruchtermanReingold(
      spark, g, Layout.Config(iterations = 40, exact = true)))
    val linked = math.max(dist(p(1L), p(2L)), dist(p(3L), p(4L)))
    val cross = Seq(
      dist(p(1L), p(3L)), dist(p(1L), p(4L)),
      dist(p(2L), p(3L)), dist(p(2L), p(4L))).min
    assert(linked < cross, s"linked $linked should be < cross-component $cross")
  }

  test("grid far-field approximates exact: same broad geometry on a larger graph") {
    val edges = (1L to 30L).map(i => (i, i % 30 + 1)) // 30-cycle
    val g = graphOf(edges)
    val exact = positions(Layout.fruchtermanReingold(
      spark, g, Layout.Config(iterations = 10, exact = true, scale = 0.5)))
    val grid = positions(Layout.fruchtermanReingold(
      spark, g, Layout.Config(iterations = 10, exact = false, scale = 0.5)))
    assert(grid.size == 30 && grid.values.forall { case (x, y) =>
      java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y) })
    // compare pairwise-distance structure, not raw coordinates
    val ids = exact.keys.toSeq.sorted
    val pairs = for (i <- ids; j <- ids if i < j) yield (i, j)
    val de = pairs.map { case (i, j) => dist(exact(i), exact(j)) }
    val dg = pairs.map { case (i, j) => dist(grid(i), grid(j)) }
    val relErr = de.zip(dg).map { case (a, b) => math.abs(a - b) / math.max(a, 1e-9) }
    assert(relErr.sum / relErr.size < 0.2, s"mean rel err ${relErr.sum / relErr.size}")
  }

  test("cohesive variant bridges components; identical to plain FR when connected") {
    val connected = graphOf(Seq((1L, 2L), (2L, 3L)))
    val cfg = Layout.Config(iterations = 6, exact = true)
    val plain = positions(Layout.fruchtermanReingold(spark, connected, cfg))
    val coh = positions(Layout.cohesiveFruchtermanReingold(spark, connected, cfg))
    for (id <- plain.keys) {
      assert(math.abs(plain(id)._1 - coh(id)._1) < 1e-9)
      assert(math.abs(plain(id)._2 - coh(id)._2) < 1e-9)
    }

    // two far components: the virtual bridge keeps them closer than plain FR
    val split = graphOf(Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)))
    val cfgL = Layout.Config(iterations = 40, exact = true)
    def centroidGap(p: Map[Long, (Double, Double)]): Double = {
      def c(ids: Seq[Long]) =
        (ids.map(p(_)._1).sum / ids.size, ids.map(p(_)._2).sum / ids.size)
      dist(c(Seq(1L, 2L, 3L)), c(Seq(10L, 11L, 12L)))
    }
    val gapPlain = centroidGap(positions(Layout.fruchtermanReingold(spark, split, cfgL)))
    val gapCoh = centroidGap(positions(Layout.cohesiveFruchtermanReingold(spark, split, cfgL)))
    assert(gapCoh < gapPlain, s"cohesive $gapCoh should be < plain $gapPlain")
  }
}
