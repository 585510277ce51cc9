package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph
import org.apache.spark.sql.functions._

class ReachSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L
  private def hmixScala(seed: Long, id: Long): Long = {
    val s = ((seed % P) + P) % P
    (s + (((id % P) + P) % P) * 73856093L % P) % P
  }
  private def regOf(seed: Long, id: Long): (Long, Long) = {
    val h = hmixScala(seed, id)
    val w = h / 16
    val rho = if (w == 0) 27L else 27L - w.toBinaryString.length
    (h % 16, rho)
  }

  private def fixture = {
    // 1→2→3→4→5 chain plus 1→3 shortcut and a 6→6-free island 6→7
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (6L, 7L))
    TemporalGraph(
      edges.toDF("src", "dst")
        .withColumn("ts", lit(0L))
        .withColumn("event_id", monotonically_increasing_id())
        .withColumn("layer", lit("_d")))
  }

  test("registers equal brute-force ball registers at every t") {
    val g = fixture
    val adj = Map(1L -> Set(2L, 3L), 2L -> Set(3L), 3L -> Set(4L), 4L -> Set(5L), 6L -> Set(7L))
      .withDefaultValue(Set.empty[Long])
    val nodes = (1L to 7L)
    def ball(v: Long, t: Int): Set[Long] = {
      var b = Set(v)
      (1 to t).foreach(_ => b = b ++ b.flatMap(adj))
      b
    }
    for (t <- 0 to 3) {
      val got = Reach.registers(spark, g, iters = t, seed = 42L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = nodes.flatMap { v =>
        ball(v, t)
          .map(w => regOf(42L, w))
          .groupBy(_._1).view.mapValues(_.map(_._2).max)
          .map { case (j, rho) => (v, j) -> rho }
      }.toMap
      assert(got == want, s"registers differ at t=$t")
    }
  }

  test("estimate: raw HLL formula and small-range correction, per node") {
    val g = fixture
    val regs = Reach.registers(spark, g, iters = 3, seed = 42L)
    val est = Reach.estimate(regs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val regMap = regs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (v <- 1L to 7L) {
      val rs = regMap.collect { case ((id, j), rho) if id == v => j -> rho }.toMap
      val denom = (16 - rs.size).toLong * 134217728L +
        rs.values.map(rho => 1L << (27 - rho).toInt).sum
      val raw = 0.673 * 256.0 * 134217728.0 / denom.toDouble
      val v0 = 16 - rs.size
      val want = if (raw <= 40.0 && v0 > 0) 16.0 * math.log(16.0 / v0) else raw
      assert(math.abs(est(v) - math.rint(want * 1e6) / 1e6) < 1e-9, s"node $v")
    }
    // ball sizes are tiny here, so the corrected estimates should be within
    // a small absolute band of the true |B(v, 3)| (sanity, not precision)
    assert(est(5L) < est(1L)) // |B(5)| = 1 < |B(1)| = 5
  }

  // plain-Scala twin of Reach.estimateRaw over a register map (UNROUNDED)
  private def estOf(rs: Map[Long, Long]): Double = {
    val denom = (16 - rs.size).toLong * 134217728L +
      rs.values.map(rho => 1L << (27 - rho).toInt).sum
    val raw = 0.673 * 256.0 * 134217728.0 / denom.toDouble
    val v0 = 16 - rs.size
    if (raw <= 40.0 && v0 > 0) 16.0 * math.log(16.0 / v0) else raw
  }

  test("ballSeries matches per-t register estimates; harmonic/closeness match the fold model") {
    val g = fixture
    val adj = Map(1L -> Set(2L, 3L), 2L -> Set(3L), 3L -> Set(4L), 4L -> Set(5L), 6L -> Set(7L))
      .withDefaultValue(Set.empty[Long])
    def ball(v: Long, t: Int): Set[Long] = {
      var b = Set(v)
      (1 to t).foreach(_ => b = b ++ b.flatMap(adj))
      b
    }
    // model ball estimates per (node, t) from exact ball registers
    def bModel(v: Long, t: Int): Double =
      estOf(
        ball(v, t).toSeq.map(w => regOf(42L, w))
          .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap)

    val series = Reach.ballSeries(spark, g, iters = 3, seed = 42L)
    assert(series.size == 4)
    for (t <- 0 to 3) {
      val got = series(t).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (1L to 7L).foreach(v => assert(math.abs(got(v) - bModel(v, t)) < 1e-9, s"t=$t v=$v"))
    }

    val hc = Reach.harmonicCloseness(spark, g, iters = 3, seed = 42L)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    (1L to 7L).foreach { v =>
      val bs = (0 to 3).map(t => bModel(v, t))
      val ds = (1 to 3).map(t => math.max(bs(t) - bs(t - 1), 0.0))
      val harm = ds.zipWithIndex.map { case (d, i) => d / (i + 1) }.reduce(_ + _)
      val dist = ds.zipWithIndex.map { case (d, i) => d * (i + 1) }.reduce(_ + _)
      val close = if (dist > 0.0) (bs(3) - 1.0) / dist else 0.0
      val (gb, gh, gc) = hc(v)
      assert(math.abs(gb - math.rint(bs(3) * 1e6) / 1e6) < 1e-9, s"ball v=$v")
      assert(math.abs(gh - math.rint(harm * 1e6) / 1e6) < 1e-9, s"harmonic v=$v")
      assert(math.abs(gc - math.rint(close * 1e6) / 1e6) < 1e-9, s"closeness v=$v")
    }
    // ordering sanity: the chain head reaches everything downstream, the
    // tail reaches nothing — harmonic must rank 1 above 5
    assert(hc(1L)._2 > hc(5L)._2)
    assert(hc(5L)._2 == 0.0 && hc(5L)._3 == 0.0) // sink: nothing reached
  }

  test("effectiveDiameter: chain graph 90% diameter and reach total") {
    val g = fixture
    val got = Reach.effectiveDiameter(spark, g, iters = 3, q = 0.9, seed = 42L).collect().head
    val adj = Map(1L -> Set(2L, 3L), 2L -> Set(3L), 3L -> Set(4L), 4L -> Set(5L), 6L -> Set(7L))
      .withDefaultValue(Set.empty[Long])
    def ball(v: Long, t: Int): Set[Long] = {
      var b = Set(v)
      (1 to t).foreach(_ => b = b ++ b.flatMap(adj))
      b
    }
    def bModel(v: Long, t: Int): Double =
      estOf(
        ball(v, t).toSeq.map(w => regOf(42L, w))
          .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap)
    val ns = (0 to 3).map(t => (1L to 7L).map(v => bModel(v, t)).sum)
    val eff = ns.indexWhere(_ >= 0.9 * ns.last)
    assert(got.getLong(0) == eff.toLong)
    assert(math.abs(got.getDouble(1) - math.rint(ns.last * 100.0) / 100.0) < 1e-6)
  }

  test("registers are monotone in t and island stays separate") {
    val g = fixture
    val r1 = Reach.registers(spark, g, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val r3 = Reach.registers(spark, g, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    r1.foreach { case (k, rho) => assert(r3.getOrElse(k, 0L) >= rho) }
    // node 6 reaches only {6, 7} at any t: registers from exactly those
    val from6 = r3.collect { case ((6L, j), rho) => (j, rho) }.toSet
    val want6 = Set(regOf(42L, 6L), regOf(42L, 7L))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap.toSet
    assert(from6 == want6)
  }
}
