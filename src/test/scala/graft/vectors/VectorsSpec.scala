package graft.vectors

import graft.SparkSpec
import graft.graph.TemporalGraph
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {

  //     1 ── 2 ── 3      (chain), plus 4 ── 5 off to the side
  private def graph = {
    import spark.implicits._
    TemporalGraph(
      Seq(
        (1L, 2L, 10L, 1L, "a"),
        (2L, 3L, 20L, 2L, "a"),
        (2L, 3L, 30L, 3L, "a"),
        (4L, 5L, 40L, 4L, "a"))
        .toDF("src", "dst", "ts", "event_id", "layer"))
  }

  test("hash embedder is deterministic and token-order sensitive") {
    import spark.implicits._
    val e = HashEmbedder(dim = 8, seed = 7L)
    val df = Seq("alpha beta", "alpha beta", "beta alpha", "").toDF("q")
      .select(e.embed("q").as("emb"))
    val rows = df.collect().map(_.getSeq[Double](0))
    assert(rows(0) == rows(1))          // deterministic
    assert(rows(0).length == 8)
    assert(rows(0).sum == rows(2).sum)  // bag-of-words: order changes nothing in the sum
    assert(rows(3).forall(_ == 0.0))    // empty doc → zero vector
  }

  test("portable embedder matches the fast one in shape and DuckDB SQL generation") {
    import spark.implicits._
    val p = HashEmbedder(dim = 4, seed = 42L, portable = true)
    val emb = Seq("node 42 has 7 events from 3 to 9").toDF("q")
      .select(p.embed("q").as("emb")).first().getSeq[Double](0)
    // values computed independently with the DuckDB prototype of the same formula
    assert(math.abs(emb(0) - -4.419602) < 1e-9)
    assert(math.abs(emb(1) - 1.929994) < 1e-9)
    assert(math.abs(emb(2) - -1.720908) < 1e-9)
    assert(math.abs(emb(3) - -1.372794) < 1e-9)
    assert(p.duckDbSql("doc").contains("73856093"))
  }

  test("vectorise renders docs and embeddings for every node and edge") {
    val vg = Vectorise(graph, HashEmbedder(dim = 8))
    val nodes = vg.nodeDb.collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("doc"))).toMap
    assert(nodes.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(nodes(2L) == "node 2 events 3 span 10 30") // 1→2 at 10, two 2→3 events
    assert(vg.edgeDb.count() == 3)                    // (1,2), (2,3), (4,5)
    val e23 = vg.edgeDb.filter(col("src") === 2 && col("dst") === 3).first()
    assert(e23.getString(e23.fieldIndex("doc")) == "edge 2 to 3 events 2 span 20 30")
  }

  test("nodesBySimilarity ranks the node whose doc matches the query first") {
    val vg = Vectorise(graph, HashEmbedder(dim = 16))
    val sel = vg.nodesBySimilarity("node 2 events 3 span 10 30", limit = 2)
    val got = sel.nodes.orderBy(col("score").desc).collect()
    assert(got.head.getLong(0) == 2L)
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-9) // exact doc match → cosine 1
    assert(sel.edges.count() == 0)
  }

  test("entitiesBySimilarity pools nodes and edges; documents join back") {
    val vg = Vectorise(graph, HashEmbedder(dim = 16))
    val sel = vg.entitiesBySimilarity("edge 2 to 3 events 2 span 20 30", limit = 1)
    assert(sel.nodes.count() + sel.edges.count() == 1)
    val e = sel.edges.collect()
    assert(e.length == 1 && e(0).getLong(0) == 2L && e(0).getLong(1) == 3L)
    val docs = sel.documents.collect()
    assert(docs.length == 1 && docs(0).getString(0) == "edge 2 to 3 events 2 span 20 30")
  }

  test("window filters entities to those with events inside it") {
    val vg = Vectorise(graph, HashEmbedder(dim = 8))
    // window [35, 50): only the 4─5 edge (ts 40) and nodes 4, 5 qualify
    val sel = vg.nodesBySimilarity("node", limit = 10, window = Some((35L, 50L)))
    assert(sel.nodes.collect().map(_.getLong(0)).toSet == Set(4L, 5L))
  }

  test("expand adds the 1-hop neighbourhood; twice reaches 2 hops") {
    val vg = Vectorise(graph, HashEmbedder(dim = 8))
    val sel1 = vg.emptySelection.addNodes(Seq(1L)).expand(1)
    assert(sel1.nodes.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(sel1.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val sel2 = vg.emptySelection.addNodes(Seq(1L)).expand(2)
    assert(sel2.nodes.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(sel2.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (2L, 3L)))
  }

  test("expandEntitiesBySimilarity grows along the graph up to the limit") {
    val vg = Vectorise(graph, HashEmbedder(dim = 16))
    // seed at node 1; limit 2 new entities; component of 1 has 4 more
    // entities (nodes 2, 3 + edges (1,2), (2,3)) — exactly 2 must be added
    val sel = vg.emptySelection.addNodes(Seq(1L))
      .expandEntitiesBySimilarity("node 3 events 2 span 20 30", limit = 2)
    assert(sel.nodes.count() + sel.edges.count() == 3) // seed + 2
    // disconnected 4─5 never enters the selection
    assert(sel.nodes.filter(col("id").isin(4L, 5L)).count() == 0)
    // dry frontier: asking for more than the component holds stops cleanly
    val all = vg.emptySelection.addNodes(Seq(1L))
      .expandEntitiesBySimilarity("node", limit = 100)
    assert(all.nodes.count() == 3 && all.edges.count() == 2)
  }

  test("append keeps max score per entity; addEdges validates against the db") {
    val vg = Vectorise(graph, HashEmbedder(dim = 8))
    val a = vg.nodesBySimilarity("node 2 events 3 span 10 30", limit = 1)
    val b = vg.emptySelection.addNodes(Seq(2L, 3L))
    val merged = a.append(b)
    val byId = merged.nodes.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId.keySet == Set(2L, 3L))
    assert(byId(2L) > 0.99)           // max(score, 0) keeps the similarity score
    val withEdge = merged.addEdges(Seq((2L, 3L), (9L, 9L))) // (9,9) not a real edge
    assert(withEdge.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 3L)))
  }

  test("clusterNodes groups entities by embedding; every node labelled once") {
    val vg = Vectorise(graph, HashEmbedder(dim = 8))
    val r = vg.clusterNodes(k = 2, assignRounds = 2)
    val rows = r.assignment.collect()
    assert(rows.length == 5, "one labelled row per node")
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
    assert(rows.forall(row => row.getLong(1) >= 1L && row.getLong(1) <= 2L))
    // deterministic across runs
    val again = vg.clusterNodes(k = 2, assignRounds = 2).assignment.collect()
    assert(rows.map(r2 => (r2.getLong(0), r2.getLong(1))).toSet ==
      again.map(r2 => (r2.getLong(0), r2.getLong(1))).toSet)
  }
}
