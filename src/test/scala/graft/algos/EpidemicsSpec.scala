package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

class EpidemicsSpec extends SparkSpec {

  private def graphOf(edges: Seq[(Long, Long, Long)]): TemporalGraph = {
    import spark.implicits._
    TemporalGraph(
      edges.zipWithIndex
        .map { case ((s, d, t), i) => (s, d, t, i.toLong, "_default") }
        .toDF("src", "dst", "ts", "event_id", "layer"))
  }

  private def seedsOf(ids: Long*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }

  test("SI with p=1: infection follows time-respecting paths with +1 incubation") {
    // 1→2@5, 2→3@3 (too early: 2 active only from 6), 2→3@10, 3→4@6 (too early)
    val g = graphOf(Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 3L, 10L), (3L, 4L, 6L)))
    val res = Epidemics
      .run(spark, g, seedsOf(1L), Epidemics.Config(infectionProb = 1.0, initialInfection = 0L))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(res.keySet == Set(1L, 2L, 3L))
    assert(res(1L) == ((0L, 1L, Long.MaxValue)))
    assert(res(2L) == ((5L, 6L, Long.MaxValue)))
    assert(res(3L) == ((10L, 11L, Long.MaxValue)))
  }

  test("p=0 infects only the seeds") {
    val g = graphOf(Seq((1L, 2L, 5L), (2L, 3L, 10L)))
    val res = Epidemics
      .run(spark, g, seedsOf(1L), Epidemics.Config(infectionProb = 0.0, initialInfection = 0L))
      .collect()
    assert(res.map(_.getLong(0)).toSet == Set(1L))
  }

  test("instant recovery (huge recovery rate) stops all spread") {
    val g = graphOf(Seq((1L, 2L, 5L), (2L, 3L, 10L)))
    val res = Epidemics
      .run(
        spark, g, seedsOf(1L),
        Epidemics.Config(infectionProb = 1.0, initialInfection = 0L, recoveryRate = Some(1e12)))
      .collect()
    assert(res.map(_.getLong(0)).toSet == Set(1L))
  }

  test("deterministic across runs and parallelism") {
    val g = graphOf((1L to 60L).map(i => (i % 20, (i * 7) % 20, i)))
    val cfg = Epidemics.Config(
      infectionProb = 0.5, initialInfection = 0L,
      recoveryRate = Some(0.05), incubationRate = Some(0.5), seed = 7L)
    def runOnce() = Epidemics.run(spark, g, seedsOf(0L, 1L), cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val a = runOnce()
    val b = runOnce()
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("infection set is monotone in infection probability (shared hash draws)") {
    val g = graphOf((1L to 80L).map(i => (i % 25, (i * 11) % 25, i)))
    def infectedAt(p: Double) = Epidemics
      .run(spark, g, seedsOf(0L), Epidemics.Config(infectionProb = p, initialInfection = 0L))
      .collect().map(_.getLong(0)).toSet
    val lo = infectedAt(0.3)
    val hi = infectedAt(1.0)
    assert(lo.subsetOf(hi), s"${lo -- hi} infected at p=0.3 but not p=1")
  }

  test("seed pickers: number and fraction") {
    val g = graphOf((1L to 40L).map(i => (i % 10, (i + 1) % 10, i)))
    assert(Epidemics.seedNumber(g, 3, seed = 1L).count() == 3)
    val frac = Epidemics.seedFraction(g, 0.5, seed = 1L).count()
    assert(frac >= 1 && frac <= 9)
    // deterministic
    assert(
      Epidemics.seedNumber(g, 3, 1L).collect().map(_.getLong(0)).toSeq ==
        Epidemics.seedNumber(g, 3, 1L).collect().map(_.getLong(0)).toSeq)
  }
}
