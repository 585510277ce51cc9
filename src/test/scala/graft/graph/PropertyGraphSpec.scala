package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PropertyGraphSpec extends SparkSpec {

  private def fixture: PropertyGraph = {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L, 10L, 0L, "_default"),
      (1L, 3L, 20L, 1L, "_default"),
      (2L, 3L, 30L, 2L, "_default"))
      .toDF("src", "dst", "ts", "event_id", "layer")
    val nodes = Seq(
      (1L, 0L, Some("A"), Some(1.0)),
      (1L, 5L, None, Some(2.0)),
      (2L, 0L, Some("B"), Some(5.0)),
      (3L, 1L, Some("A"), None),
      (3L, 9L, Some("Z"), Some(7.0))) // later conflicting type: ignored (set-once)
      .toDF("id", "ts", "node_type", "score")
    PropertyGraph(TemporalGraph(edges), nodes)
  }

  test("nodeTypes takes the first non-null type per node (set-once rule)") {
    val got = fixture.nodeTypes.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "A", 2L -> "B", 3L -> "A"))
  }

  test("subgraphNodeTypes keeps edges with BOTH endpoints of the given types") {
    val sub = fixture.subgraphNodeTypes("A")
    val edges = sub.graph.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 3L)))
    // node dimension restricted too
    assert(sub.nodes.select("id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // multiple types widen the view
    val sub2 = fixture.subgraphNodeTypes("A", "B")
    assert(sub2.graph.edges.count() == 3)
  }

  test("property history / as-of / latest mirror TemporalProp semantics") {
    val g = fixture
    assert(g.propertyHistory("score").count() == 4) // null update dropped
    val at4 = g.propertyAt("score", 4L).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("value")).toMap
    assert(at4 == Map(1L -> 1.0, 2L -> 5.0)) // node 3 has no value yet
    val at6 = g.propertyAt("score", 6L).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("value")).toMap
    assert(at6 == Map(1L -> 2.0, 2L -> 5.0))
    val latest = g.propertyLatest("score").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("value")).toMap
    assert(latest == Map(1L -> 2.0, 2L -> 5.0, 3L -> 7.0))
  }

  test("nodeHistoryStats") {
    val got = fixture.nodeHistoryStats.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((0L, 5L, 2L)), 2L -> ((0L, 0L, 1L)), 3L -> ((1L, 9L, 2L))))
  }
}
