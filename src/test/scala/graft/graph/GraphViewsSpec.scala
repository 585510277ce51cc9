package graft.graph

import graft.SparkSpec
import graft.graph.GraphViews.{SortKey, ViewOp}
import org.apache.spark.sql.functions._

/**
 * The apply_views contract (raphtory-graphql graph.rs:857-920): an ordered
 * chain of view ops folded over the running view, each op narrowing what
 * the previous produced; plus the sorted/paged nodes/edges resolvers.
 */
class GraphViewsSpec extends SparkSpec {

  private def graph: TemporalGraph = {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      // (src, dst, ts, event_id, layer)
      (1L, 2L, 10L, 0L, "_default"),
      (2L, 3L, 20L, 1L, "_default"),
      (3L, 4L, 30L, 2L, "tool"),
      (4L, 5L, 40L, 3L, "tool"),
      (5L, 1L, 50L, 4L, "_default"),
      (1L, 3L, 60L, 5L, "reply"),
      (2L, 4L, 70L, 6L, "reply"))
    TemporalGraph(rows.toDF("src", "dst", "ts", "event_id", "layer"))
  }

  private def propertyGraph: PropertyGraph = {
    val spark0 = spark
    import spark0.implicits._
    val nodes = Seq(
      (1L, 0L, "user", 25),
      (2L, 0L, "user", 35),
      (3L, 0L, "bot", 1),
      (4L, 0L, "user", 45),
      (5L, 0L, "bot", 2)).toDF("id", "ts", "node_type", "age")
    PropertyGraph(graph, nodes)
  }

  test("ordered chain: window then layers then exclude-nodes composes left to right") {
    val v = GraphViews.applyViews(
      graph,
      Seq(
        ViewOp.Window(15, 65), // events 20..60
        ViewOp.ExcludeLayers(Seq("tool")), // drops 30, 40
        ViewOp.ExcludeNodes(Seq(5L)))) // drops 50→(5,1)
    val left = v.edges.select("event_id").collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(1L, 5L))
    assert(v.start.contains(15L) && v.end.contains(65L))
  }

  test("shrink ops inside a chain clamp and never widen") {
    val v = GraphViews.applyViews(
      graph,
      Seq(ViewOp.Window(15, 65), ViewOp.ShrinkWindow(5, 45), ViewOp.ShrinkStart(25)))
    assert(v.start.contains(25L) && v.end.contains(45L))
    assert(v.edges.select("ts").collect().map(_.getLong(0)).sorted.toSeq == Seq(30L, 40L))
  }

  test("default-layer / at / latest variants") {
    val dl = GraphViews.applyViews(graph, Seq(ViewOp.DefaultLayer))
    assert(dl.countTemporalEdges() == 3)
    val at = GraphViews.applyViews(graph, Seq(ViewOp.At(30L)))
    assert(at.edges.select("event_id").first().getLong(0) == 2L)
    val latest = GraphViews.applyViews(graph, Seq(ViewOp.Latest))
    assert(latest.edges.select("event_id").first().getLong(0) == 6L)
  }

  test("node-type subgraph and composite node filter narrow both dimensions") {
    val pg = GraphViews.applyViews(propertyGraph, Seq(ViewOp.SubgraphNodeTypes(Seq("user"))))
    // surviving edges: both endpoints typed 'user' → (1,2), (2,4)
    assert(pg.graph.edges.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 6L))
    assert(pg.nodes.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))

    val filtered = GraphViews.applyViews(
      propertyGraph,
      Seq(ViewOp.NodeFilter(col("age") >= 25 && col("node_type") === "user")))
    assert(
      filtered.graph.edges.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 6L))

    // chain: node filter then a window over the result
    val chained = GraphViews.applyViews(
      propertyGraph,
      Seq(ViewOp.NodeFilter(col("node_type") === "user"), ViewOp.Window(0, 50)))
    assert(chained.graph.edges.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L))
  }

  test("nodes resolver: sort + deterministic pagination") {
    val pg = propertyGraph
    val all = GraphViews.nodesPage(pg, Seq(SortKey("deg", desc = true)))
      .select("id").collect().map(_.getLong(0))
    assert(all.length == 5)
    // pages tile the full sorted list
    val p1 = GraphViews.nodesPage(pg, Seq(SortKey("deg", desc = true)), offset = 0, limit = 2)
      .select("id").collect().map(_.getLong(0))
    val p2 = GraphViews.nodesPage(pg, Seq(SortKey("deg", desc = true)), offset = 2, limit = 2)
      .select("id").collect().map(_.getLong(0))
    val p3 = GraphViews.nodesPage(pg, Seq(SortKey("deg", desc = true)), offset = 4, limit = 2)
      .select("id").collect().map(_.getLong(0))
    assert((p1 ++ p2 ++ p3).toSeq == all.toSeq)
    // node_type rides along when the dimension carries it
    assert(GraphViews.nodesPage(pg).columns.contains("node_type"))
  }

  test("edges resolver pages the temporal edge list") {
    val page = GraphViews.edgesPage(
      graph,
      sort = Seq(SortKey("ts", desc = true)),
      offset = 1,
      limit = 3)
    assert(page.select("ts").collect().map(_.getLong(0)).toSeq == Seq(60L, 50L, 40L))
  }
}
