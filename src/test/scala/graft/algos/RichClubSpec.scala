package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

/** Goldens from the reference's rich_club_test (motifs.rs:413-478) — the
  * toy example from Pedreschi et al. 2022. */
class RichClubSpec extends SparkSpec {

  private val fixtureEdges = Seq[(Long, Long, Long)](
    (1, 1, 2), (1, 1, 3), (1, 1, 4), (1, 2, 3), (1, 2, 4), (1, 3, 4), (1, 4, 5),
    (2, 1, 2), (2, 1, 3), (2, 1, 4), (2, 3, 4), (2, 2, 6),
    (3, 1, 2), (3, 2, 4), (3, 3, 4), (3, 1, 4), (3, 1, 3), (3, 1, 7),
    (4, 1, 2), (4, 1, 3), (4, 1, 4), (4, 2, 8),
    (5, 1, 2), (5, 1, 3), (5, 1, 4), (5, 2, 4), (5, 3, 9))

  private def fixtureGraph: TemporalGraph = {
    import spark.implicits._
    TemporalGraph(
      fixtureEdges.zipWithIndex
        .map { case ((t, s, d), i) => (s, d, t, i.toLong, "_default") }
        .toDF("src", "dst", "ts", "event_id", "layer"))
  }

  test("toy graph matches the reference goldens (k=3, window sizes 1/3/5)") {
    val g = fixtureGraph
    val views = g.rolling(1L, Some(1L)).map(_._3)
    assert(views.length == 5)
    val rc1 = RichClub.temporalRichClub(spark, g, views, 3, 1)
    val rc3 = RichClub.temporalRichClub(spark, g, views, 3, 3)
    val rc5 = RichClub.temporalRichClub(spark, g, views, 3, 5)
    assert(math.abs(rc1 - 1.0) < 0.001, s"rc1=$rc1")
    assert(math.abs(rc3 - 0.66666) < 0.001, s"rc3=$rc3")
    assert(math.abs(rc5 - 0.5) < 0.001, s"rc5=$rc5")
  }

  test("tumbling fast path equals the generic view union") {
    val g = fixtureGraph
    val views = g.rolling(1L, Some(1L)).map(_._3)
    for (w <- Seq(1, 2, 3, 5)) {
      val generic = RichClub.temporalRichClub(spark, g, views, 3, w)
      val fast = RichClub.temporalRichClubTumbling(spark, g, stepMs = 1L, k = 3, windowSize = w)
      assert(generic == fast, s"window=$w generic=$generic fast=$fast")
    }
  }

  test("degenerate cases return 0.0") {
    val g = fixtureGraph
    val views = g.rolling(1L, Some(1L)).map(_._3)
    // club of size <= 1
    assert(RichClub.temporalRichClub(spark, g, views, 100, 1) == 0.0)
    // window longer than the snapshot sequence -> no complete chunk
    assert(RichClub.temporalRichClub(spark, g, views, 3, 6) == 0.0)
    assert(RichClub.temporalRichClubTumbling(spark, g, 1L, 3, 6) == 0.0)
  }
}
