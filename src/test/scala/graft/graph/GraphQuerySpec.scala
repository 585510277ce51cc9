package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The JSON wire format must interpret to exactly the same frames as the
 * hand-written typed chain — parse → applyViews → resolver end to end,
 * plus codec edge cases and errors.
 */
class GraphQuerySpec extends SparkSpec {

  private def g: TemporalGraph =
    TemporalGraph(
      TemporalGraph.fromTriples(
        spark,
        Seq(
          (1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L),
          (4L, 5L, 40L), (5L, 1L, 50L), (2L, 4L, 60L))).edges
        .withColumn("layer", when(col("ts") > 35L, lit("late")).otherwise(lit("_default"))))

  private def pg: PropertyGraph = {
    val session = spark
    import session.implicits._
    val nodes = Seq(
      (1L, 0L, "user", 0.9), (2L, 0L, "user", 0.2), (3L, 0L, "bot", 0.7),
      (4L, 0L, "user", 0.4), (5L, 0L, "bot", 0.1))
      .toDF("id", "ts", "node_type", "score")
    PropertyGraph(g, nodes)
  }

  test("JSON chain equals the typed chain (edges)") {
    val json =
      """{"view":[
        |  {"op":"window","start":15,"end":55},
        |  {"op":"excludeLayers","names":["late"]},
        |  {"op":"excludeNodes","ids":[4]},
        |  {"op":"edgeFilter","filter":{"not":{"field":"src","in":[5]}}}],
        | "select":{"target":"edges","sort":[{"column":"ts","desc":true}]}}""".stripMargin
    val got = GraphQuery.run(g, json).select("src", "dst", "ts").collect().toSeq
    import GraphViews.ViewOp._
    val typed = GraphViews.edgesPage(
      GraphViews.applyViews(
        g,
        Seq(
          Window(15, 55),
          ExcludeLayers(Seq("late")),
          ExcludeNodes(Seq(4L)),
          EdgeFilter(!col("src").isin(5L)))),
      sort = Seq(GraphViews.SortKey("ts", desc = true)))
      .select("src", "dst", "ts").collect().toSeq
    assert(got == typed)
    assert(got.map(_.getLong(2)) == Seq(20L)) // only edge 2->3 survives
  }

  test("JSON node filter with and/eq/gt narrows nodes and edges") {
    val json =
      """{"view":[
        |  {"op":"nodeFilter","filter":{"and":[
        |     {"field":"node_type","eq":"user"},
        |     {"field":"score","gt":0.15}]}}],
        | "select":{"target":"nodes","sort":[{"column":"deg","desc":true}],"limit":5}}""".stripMargin
    // users with score > 0.15 = {1,2,4}; the INDUCED subgraph keeps edges
    // 1->2 and 2->4, so all three appear in the node resolver
    val ids = GraphQuery.run(pg, json).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L))
    // tighter score cut {1,4}: no edge between 1 and 4 survives the induced
    // subgraph, so the node resolver is empty — this engine's nodes are
    // edge-derived (SURVEY §1.1 event model), so a filter that isolates
    // every matching node yields an empty graph
    val tight = json.replace("0.15", "0.3")
    assert(GraphQuery.run(pg, tight).count() == 0L)
  }

  test("list quantifier and paging in the codec") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, Seq(1.0, 9.0)), (2L, Seq(2.0, 3.0)), (3L, Seq(8.0, 8.5)))
      .toDF("id", "vals")
    val pred = GraphQuery.parsePred(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        """{"and":[{"field":"vals","any":{"gt":7.0}},
          |        {"field":"vals","all":{"gt":0.5}}]}""".stripMargin))
    val ids = docs.filter(pred.compile).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
  }

  test("selection defaults and offset/limit") {
    val json =
      """{"view":[],"select":{"target":"edges","offset":2,"limit":2}}""".stripMargin
    val rows = GraphQuery.run(g, json).select("src", "dst").collect()
    assert(rows.length == 2)
  }

  test("algorithm clause: pagerank over the composed view equals the direct call") {
    // window [0, 35) keeps edges 10/20/30 → the chain 1→2→3→4
    val json =
      """{"view":[{"op":"window","start":0,"end":35}],
        | "algorithm":{"name":"pagerank","params":{"iterCount":10,"tol":0.0}}}""".stripMargin
    val viaWire = GraphQuery.run(g, json).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = graft.algos.PageRank
      .run(spark, g.window(0, 35),
        graft.algos.PageRank.Config(maxIter = 10, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaWire.keySet == Set(1L, 2L, 3L, 4L))
    assert(viaWire == direct)
  }

  test("algorithm clause: shortest_path needs source; select pages the result") {
    intercept[IllegalArgumentException](
      GraphQuery.run(g, """{"algorithm":{"name":"shortest_path"}}"""))
    val json =
      """{"algorithm":{"name":"shortest_path","params":{"source":1,"cutoff":3}},
        | "select":{"target":"nodes","sort":[{"column":"dist","desc":false}],"limit":2}}""".stripMargin
    val rows = GraphQuery.run(g, json).select("id", "dist").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.toSeq == Seq((1L, 0), (2L, 1))) // BFS from 1: self, then 2
    intercept[IllegalArgumentException](
      GraphQuery.run(g, """{"algorithm":{"name":"quantum_walk"}}"""))
  }

  test("algorithm clause: the extended library dispatch equals direct calls") {
    // eigenvector over a windowed view
    val eig = GraphQuery.run(
      g,
      """{"view":[{"op":"window","start":0,"end":35}],
        | "algorithm":{"name":"eigenvector","params":{"iterCount":8,"tol":0.0}}}""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val eigDirect = graft.algos.Centrality.eigenvector(
      spark, g.window(0, 35),
      graft.algos.Centrality.Config(maxIter = 8, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(eig == eigDirect)
    // katz honours params
    val katz = GraphQuery.run(
      g, """{"algorithm":{"name":"katz","params":{"iterCount":5,"alpha":0.05}}}""")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val katzDirect = graft.algos.Centrality.katz(
      spark, g, alpha = 0.05, beta = 1.0,
      graft.algos.Centrality.Config(maxIter = 5, tol = 0.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(katz == katzDirect)
    // mis / coloring / harmonic / lpa / triangle_count dispatch and return rows
    assert(GraphQuery.run(g, """{"algorithm":{"name":"mis"}}""").columns.toSeq ==
      Seq("id", "in_mis"))
    assert(GraphQuery.run(g, """{"algorithm":{"name":"coloring"}}""").columns.toSeq ==
      Seq("id", "color"))
    assert(GraphQuery.run(
      g, """{"algorithm":{"name":"harmonic","params":{"iterCount":2}}}""")
      .columns.contains("harmonic_est"))
    assert(GraphQuery.run(g, """{"algorithm":{"name":"label_propagation"}}""")
      .count() > 0)
    assert(GraphQuery.run(g, """{"algorithm":{"name":"triangle_count"}}""")
      .columns.toSeq == Seq("triangles"))
  }

  test("algorithm clause: structural dispatches equal direct calls (hits/kcore/ktruss/scc/louvain/degree/…)") {
    val hits = GraphQuery.run(
      g, """{"algorithm":{"name":"hits","params":{"iterCount":5,"tol":0.0}}}""")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val hitsDirect = graft.algos.Hits.run(
      spark, g, graft.algos.Hits.Config(maxIter = 5, tol = 0.0))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(hits == hitsDirect)
    // 2-core of the cycle graph: every node survives; k is mandatory
    assert(GraphQuery.run(g, """{"algorithm":{"name":"kcore","params":{"k":2}}}""")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
    intercept[IllegalArgumentException](
      GraphQuery.run(g, """{"algorithm":{"name":"kcore"}}"""))
    // 3-truss: exactly the {2,3,4} triangle's edges, default-sorted (a, b)
    assert(GraphQuery.run(g, """{"algorithm":{"name":"ktruss","params":{"k":3}}}""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 3L), (2L, 4L), (3L, 4L)))
    // the directed 5-cycle is one SCC labelled by its min id
    val scc = GraphQuery.run(g, """{"algorithm":{"name":"scc"}}""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc.keySet == Set(1L, 2L, 3L, 4L, 5L) && scc.values.toSet == Set(1L))
    assert(GraphQuery.run(g, """{"algorithm":{"name":"louvain"}}""").columns.toSeq ==
      Seq("id", "community"))
    // one weak component of five nodes
    assert(GraphQuery.run(g, """{"algorithm":{"name":"component_sizes"}}""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 5L)))
    // degree stats is a single global row; per-node surfaces return rows
    assert(GraphQuery.run(g, """{"algorithm":{"name":"degree"}}""").count() == 1L)
    assert(GraphQuery.run(g, """{"algorithm":{"name":"betweenness"}}""").count() == 5L)
    assert(GraphQuery.run(g, """{"algorithm":{"name":"local_triangle_count"}}""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(GraphQuery.run(g, """{"algorithm":{"name":"local_clustering_coefficient"}}""")
      .count() == 5L)
  }

  test("algorithm clause: connected_components over a layer view") {
    // excluding the 'late' layer removes 4→5, 5→1 and 2→4: components
    // {1,2,3,4} (chain) and {5} drops to... 5 has no remaining edges, so
    // it leaves the view entirely (nodes are edge endpoints)
    val json =
      """{"view":[{"op":"excludeLayers","names":["late"]}],
        | "algorithm":{"name":"connected_components"}}""".stripMargin
    val comps = GraphQuery.run(g, json).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.keySet == Set(1L, 2L, 3L, 4L))
    assert(comps.values.toSet.size == 1)
  }

  test("malformed documents fail loudly") {
    intercept[IllegalArgumentException](
      GraphQuery.run(g, """{"view":[{"op":"teleport"}]}"""))
    intercept[IllegalArgumentException](
      GraphQuery.run(g, """{"view":[{"op":"window","start":1}]}"""))
    intercept[IllegalArgumentException](
      GraphQuery.run(g, """{"view":[],"select":{"target":"hyperedges"}}"""))
    intercept[IllegalArgumentException](
      GraphQuery.parse("""{"view":[{"op":"edgeFilter","filter":{"field":"x","like":"y"}}]}"""))
  }

  test("nullModel view op: permuted timestamps through the wire format") {
    // the shuffle key must be UNIQUE (fromTriples leaves event_id = 0) —
    // real loaders/EdgeBuilder assign unique event ids
    val g = TemporalGraph(GraphQuerySpec.this.g.edges.withColumn("event_id", col("ts")))
    val json =
      """{"view":[{"op":"nullModel","kind":"permute_ts","seed":7}],
        | "select":{"target":"edges"}}""".stripMargin
    val got = GraphQuery.run(g, json)
    // same edge count, same ts multiset, static (src,dst) pairs intact
    assert(got.count() == g.edges.count())
    assert(got.select("ts").collect().map(_.getLong(0)).sorted.toSeq ==
      g.edges.select("ts").collect().map(_.getLong(0)).sorted.toSeq)
    assert(got.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      g.edges.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // equals the direct call
    val direct = NullModels.permutedTimestamps(g.edges, seed = 7L)
      .select("event_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got.select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq == direct)
    // composes after a window; unknown kind is loud
    val windowed = GraphQuery.run(
      g,
      """{"view":[{"op":"window","start":15,"end":55},
        |  {"op":"nullModel","kind":"configuration"}],
        | "select":{"target":"edges"}}""".stripMargin)
    assert(windowed.count() == g.window(15, 55).edges.count())
    intercept[IllegalArgumentException](
      GraphQuery.run(g, """{"view":[{"op":"nullModel","kind":"nope"}],"select":{"target":"edges"}}"""))
  }
}
