package graft.rel

import graft.SparkSpec
import graft.graph.TemporalGraph
import org.apache.spark.sql.functions._

class RelSpec extends SparkSpec {

  import spark.implicits._

  test("predicate algebra compiles to pushable Columns") {
    import Predicates._
    val df = Seq(
      (1L, "PROMO box", 10, Seq(1.0, 2.0, 3.0), Some("x")),
      (2L, "STANDARD tin", 20, Seq(5.0), None),
      (3L, "PROMO bag", 30, Seq.empty[Double], Some("y")))
      .toDF("id", "name", "size", "vals", "tag")

    assert(df.filter((F("name").startsWith("PROMO") && F("size") < 25).compile)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(df.filter(F("size").isIn(10, 30).compile).count() == 2)
    assert(df.filter(F("tag").isNone.compile).collect()(0).getLong(0) == 2L)
    assert(df.filter(F("vals").any(_ > 2.5).compile).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(df.filter(F("vals").all(_ > 2.5).compile).collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(df.filter((F("vals").first === 1.0).compile).count() == 1)
    assert(df.select(F("vals").len.as("n")).collect().map(_.getLong(0)).toSeq == Seq(3L, 1L, 0L))
    assert(df.filter((!F("name").containsStr("tin")).compile).count() == 2)
  }

  test("result ops mirror NodeStateOps semantics") {
    val df = Seq((1L, 5.0), (2L, 1.0), (3L, 9.0), (4L, 5.0)).toDF("id", "score")
    assert(ResultOps.topK(df, "score", 2).collect().map(_.getLong(0)).toSeq == Seq(3L, 1L))
    assert(ResultOps.bottomK(df, "score", 1).collect()(0).getLong(0) == 2L)
    assert(ResultOps.maxItem(df, "score").contains((3L, 9.0)))
    assert(ResultOps.minItem(df, "score").contains((2L, 1.0)))
    assert(ResultOps.sum(df, "score") == 20.0)
    assert(ResultOps.mean(df, "score") == 5.0)
    assert(ResultOps.median(df, "score").contains(5.0))
    val grouped = ResultOps.groupBy(df, "score").collect()
      .map(r => r.getDouble(0) -> r.getSeq[Long](1).toList).toMap
    assert(grouped(5.0) == List(1L, 4L))
  }

  test("rolling/expanding window sets replicate the reference cursor") {
    // events at t = 0, 5, 10, 15 (ms); timelineEnd = 16
    val g = TemporalGraph.fromTriples(spark,
      Seq((1L, 2L, 0L), (2L, 3L, 5L), (3L, 4L, 10L), (4L, 5L, 15L)))
    // rolling(window=10, step=10): ends at 10, 20 → [0,10), [10,20)
    val roll = g.rolling(10)
    assert(roll.map(w => (w._1, w._2)) == Seq((0L, 10L), (10L, 20L)))
    assert(roll.map(_._3.countTemporalEdges()) == Seq(2L, 2L))
    // rolling(window=10, step=5): ends 5,10,15,20 → starts -5,0,5,10
    val roll2 = g.rolling(10, Some(5))
    assert(roll2.map(_._2) == Seq(5L, 10L, 15L, 20L))
    assert(roll2.map(_._3.countTemporalEdges()) == Seq(1L, 2L, 2L, 2L))
    // expanding(step=8): ends at 8, 16 (24 fails `end < timelineEnd + step`
    // since 24 < 16+8 is false) → prefix counts 2, 4
    val exp = g.expanding(8)
    assert(exp.map(_._1) == Seq(8L, 16L))
    assert(exp.map(_._2.countTemporalEdges()) == Seq(2L, 4L))
  }
}
