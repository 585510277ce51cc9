package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

class BipartiteProjectionSpec extends SparkSpec {

  import spark.implicits._

  test("projects two-mode events within delta (temporal_bipartite_projection.rs)") {
    // primaries 1, 2, 3; middles 100, 200
    // 1 and 2 touch middle 100 ten ms apart; 3 touches it much later;
    // 1 and 3 share middle 200 within delta.
    val g = TemporalGraph.fromTriples(spark, Seq(
      (1L, 100L, 1000L),
      (2L, 100L, 1010L),
      (3L, 100L, 9999L),
      (1L, 200L, 5000L),
      (3L, 200L, 5001L)))
    val primaries = Seq(1L, 2L, 3L).toDF("id")
    val got = BipartiteProjection
      .run(g, primaries, deltaMs = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((1L, 2L, 1010L), (1L, 3L, 5001L)))
  }

  test("hot middle guardrail drops oversized groups") {
    val events = (1L to 50L).map(p => (p, 100L, 1000L + p))
    val g = TemporalGraph.fromTriples(spark, events)
    val primaries = (1L to 50L).toDF("id")
    val all = BipartiteProjection.run(g, primaries, deltaMs = 1000L)
    assert(all.count() == 50L * 49 / 2)
    val bounded = BipartiteProjection.run(g, primaries, deltaMs = 1000L, maxPerMiddle = 10)
    assert(bounded.count() == 0)
  }
}
