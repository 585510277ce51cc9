package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Cypher-lite translator over the reference's transpiler test shapes
 * (raphtory-cypher/src/transpiler/mod.rs:1216-1400). The fixture mirrors
 * the reference's tiny test graphs: a handful of edges with layers and
 * timestamps; expectations computed by hand or via the equivalent typed
 * DataFrame chain.
 */
class CypherLiteSpec extends SparkSpec {

  // 1→2 (KNOWS, t=10), 2→3 (KNOWS, t=20), 3→4 (WORKS, t=30), 4→1 (WORKS, t=40), 2→4 (KNOWS, t=60)
  private def g: TemporalGraph = {
    val session = spark
    import session.implicits._
    TemporalGraph(
      Seq(
        (1L, 2L, 10L, 0L, "KNOWS"),
        (2L, 3L, 20L, 1L, "KNOWS"),
        (3L, 4L, 30L, 2L, "WORKS"),
        (4L, 1L, 40L, 3L, "WORKS"),
        (2L, 4L, 60L, 4L, "KNOWS"))
        .toDF("src", "dst", "ts", "event_id", "layer"))
  }

  test("MATCH ()-[e]->() RETURN e — all edges, expanded columns") {
    val rows = CypherLite.run(g, "MATCH ()-[e]->() RETURN e")
    assert(rows.columns.toSeq == Seq("e_src", "e_dst", "e_ts", "e_event_id", "e_layer"))
    assert(rows.count() == 5)
  }

  test("MATCH () RETURN COUNT(*) — node count; MATCH (n) RETURN COUNT(n)") {
    assert(CypherLite.run(g, "MATCH () RETURN COUNT(*)").first().getLong(0) == 4L)
    assert(CypherLite.run(g, "MATCH (n) RETURN COUNT(n)").first().getLong(0) == 4L)
  }

  test("edge counts, with and without WHERE n <> m (transpiler :1260-1284)") {
    assert(CypherLite.run(g, "MATCH (n)-[e]->(m) RETURN COUNT(e)").first().getLong(0) == 5L)
    assert(CypherLite.run(g, "MATCH (n)-[e]->(m) WHERE n <> m RETURN COUNT(e)")
      .first().getLong(0) == 5L) // no self-loops in the fixture
    assert(CypherLite.run(g, "MATCH ()-[e]->() RETURN COUNT(*)").first().getLong(0) == 5L)
  }

  test("layer pattern ()-[e:KNOWS]->() (transpiler :1316)") {
    val rows = CypherLite.run(g, "MATCH ()-[e:KNOWS]->() RETURN e")
    assert(rows.count() == 3)
    assert(rows.select("e_layer").distinct().collect().map(_.getString(0)).toSeq == Seq("KNOWS"))
  }

  test("WHERE e.time > 10 and projections (transpiler :1308,1373,1381)") {
    val rows = CypherLite.run(g, "MATCH ()-[e]->() where e.time > 10 RETURN e, type(e)")
    assert(rows.count() == 4)
    assert(rows.columns.contains("e_type"))
    val proj = CypherLite.run(g, "MATCH ()-[e]->() RETURN e.src, e.time")
    assert(proj.columns.toSeq == Seq("e_src", "e_ts"))
    assert(proj.count() == 5)
  }

  test("CONTAINS / NOT CONTAINS on a string field (transpiler :1396)") {
    assert(CypherLite.run(g, "MATCH ()-[e]->() where e.layer contains 'NOW' RETURN e").count() == 3)
    assert(CypherLite.run(g, "MATCH ()-[e]->() where NOT e.layer contains 'NOW' RETURN e").count() == 2)
  }

  test("ORDER BY e.time DESC + LIMIT (transpiler :1237,1365)") {
    val ts = CypherLite.run(g, "MATCH ()-[e]->() RETURN e.time ORDER BY e.time DESC LIMIT 2")
      .collect().map(_.getLong(0)).toSeq
    assert(ts == Seq(60L, 40L))
  }

  test("COUNT(DISTINCT e.layer) (transpiler :1357)") {
    assert(CypherLite.run(g, "MATCH ()-[e]->() RETURN COUNT(distinct e.layer)")
      .first().getLong(0) == 2L)
  }

  test("SUM/MIN/MAX/AVG aggregates, global and implicitly grouped") {
    val rows = CypherLite.run(g,
      "MATCH (a)-[e]->(b) RETURN a, SUM(e.time) AS s, MIN(e.time) AS mn, MAX(e.time) AS mx ORDER BY a")
    assert(rows.columns.toSeq == Seq("a", "s", "mn", "mx"))
    assert(rows.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 10L, 10L, 10L), (2L, 80L, 20L, 60L), (3L, 30L, 30L, 30L), (4L, 40L, 40L, 40L)))
    val global = CypherLite.run(g,
      "MATCH ()-[e]->() RETURN SUM(e.time) AS s, AVG(e.time) AS av, MIN(e.layer) AS ml").first()
    assert(global.getLong(0) == 160L)
    assert(math.abs(global.getDouble(1) - 32.0) < 1e-9)
    assert(global.getString(2) == "KNOWS")
  }

  test("SUM(DISTINCT); SUM/MAX in WITH; aggregate validation is loud") {
    // edge srcs: 1,2,3,4,2 → sum 12, distinct sum 10
    val r = CypherLite.run(g,
      "MATCH (a)-[e]->(b) RETURN SUM(a) AS s, SUM(DISTINCT a) AS sd").first()
    assert(r.getLong(0) == 12L && r.getLong(1) == 10L)
    // the WITH pipeline shares the same aggregate dispatch
    val w = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) WITH a, MAX(e.time) AS mx WHERE mx > 10 RETURN a, mx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(w == Seq((2L, 60L)))
    // * is COUNT-only; AVG(DISTINCT) refused; aggregates invalid in WHERE
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH ()-[e]->() RETURN SUM(*)"))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH ()-[e]->() RETURN AVG(DISTINCT e.time)"))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH ()-[e]->() WHERE SUM(e.time) > 1 RETURN e"))
  }

  test("RETURN DISTINCT dedups projected rows; ORDER BY names a RETURN item") {
    // edge dsts: 2,3,4,1,4 → four distinct
    val rows = CypherLite.run(g, "MATCH ()-[e]->(b) RETURN DISTINCT b ORDER BY b")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 2L, 3L, 4L))
    // multi-column distinct: KNOWS sources 1,2,2 → two (a, type) rows
    val pairs = CypherLite.run(
      g, "MATCH (a)-[e:KNOWS]->() RETURN DISTINCT a, type(e) AS t ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(pairs == Seq((1L, "KNOWS"), (2L, "KNOWS")))
    // refused alongside aggregates; ORDER BY over a dropped column is loud
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) RETURN DISTINCT a, COUNT(e)"))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) RETURN DISTINCT b ORDER BY e.time"))
  }

  test("SKIP pages an ordered result; requires ORDER BY; pages WITH top-k too") {
    val ts = CypherLite.run(g, "MATCH ()-[e]->() RETURN e.time ORDER BY e.time SKIP 1 LIMIT 2")
      .collect().map(_.getLong(0)).toSeq
    assert(ts == Seq(20L, 30L))
    // SKIP without LIMIT returns the remainder
    val rest = CypherLite.run(g, "MATCH ()-[e]->() RETURN e.time ORDER BY e.time SKIP 3")
      .collect().map(_.getLong(0)).toSeq
    assert(rest == Seq(40L, 60L))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH ()-[e]->() RETURN e.time SKIP 2"))
    // WITH-stage pagination: the middle page feeds the next stage
    val mid = CypherLite.run(g,
      "MATCH (a)-[e]->(b) WITH b, e.time AS t ORDER BY t SKIP 1 LIMIT 2 RETURN b, t ORDER BY t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(mid == Seq((3L, 20L), (4L, 30L)))
    intercept[IllegalArgumentException](CypherLite.run(g,
      "MATCH (a)-[e]->(b) WITH b, e.time AS t ORDER BY t SKIP 1 RETURN b"))
  }

  test("collect() gathers ascending; DISTINCT dedups; nulls skipped; works in WITH") {
    val rows = CypherLite.run(g,
      "MATCH (a)-[e]->(b) RETURN a, COLLECT(e.time) AS ts ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    assert(rows == Seq(
      (1L, Seq(10L)), (2L, Seq(20L, 60L)), (3L, Seq(30L)), (4L, Seq(40L))))
    // global collect; DISTINCT dedups: dsts 2,3,4,1,4
    val g1 = CypherLite.run(g,
      "MATCH ()-[e]->(b) RETURN COLLECT(b) AS bs, COLLECT(DISTINCT b) AS ds").first()
    assert(g1.getSeq[Long](0).toSeq == Seq(1L, 2L, 3L, 4L, 4L))
    assert(g1.getSeq[Long](1).toSeq == Seq(1L, 2L, 3L, 4L))
    // OPTIONAL MATCH misses leave nulls, which collect() skips
    val o = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[f:WORKS]->(c) " +
        "RETURN a, COLLECT(c) AS cs ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    assert(o == Seq((1L, Seq()), (2L, Seq(1L, 4L))))
    // collect in a WITH stage
    val w = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) WITH a, COLLECT(b) AS bs RETURN a, bs ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    assert(w == Seq((1L, Seq(2L)), (2L, Seq(3L, 4L))))
  }

  test("IN list predicates and IS [NOT] NULL (the OPTIONAL MATCH null probe)") {
    assert(CypherLite.run(g, "MATCH (a)-[e]->(b) WHERE a IN [1, 3] RETURN COUNT(*)")
      .first().getLong(0) == 2L) // edges from 1 and 3
    assert(CypherLite.run(g, "MATCH ()-[e]->() WHERE e.layer IN ['WORKS'] RETURN COUNT(*)")
      .first().getLong(0) == 2L)
    assert(CypherLite.run(g, "MATCH (a)-[e]->(b) WHERE NOT a IN [1, 3] AND e.time IN [20, 60] " +
      "RETURN COUNT(*)").first().getLong(0) == 2L) // 2→3@20, 2→4@60
    // IS NULL over an OPTIONAL MATCH miss: b=2 has no outgoing WORKS
    val misses = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[f:WORKS]->(c) " +
        "WITH a, b, c WHERE c IS NULL RETURN a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(misses == Seq((1L, 2L)))
    assert(CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[f:WORKS]->(c) " +
        "WITH a, c WHERE c IS NOT NULL RETURN COUNT(*)")
      .first().getLong(0) == 2L)
    // malformed lists are loud
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) WHERE a IN [b] RETURN a"))
  }

  test("value arithmetic in items, WHERE, ORDER BY and grouping keys") {
    // ts values 10,20,30,40,60 → t2 = ts*2+1: top two 121, 81
    val rows = CypherLite.run(g,
      "MATCH (a)-[e]->(b) RETURN a, e.time * 2 + 1 AS t2 ORDER BY t2 DESC LIMIT 2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((2L, 121L), (4L, 81L)))
    // arithmetic across hops in WHERE: only 1→2→4 gains > 20
    assert(CypherLite.run(g,
      "MATCH (a)-[e1]->(b)-[e2]->(c) WHERE e2.time - e1.time > 20 RETURN COUNT(*)")
      .first().getLong(0) == 1L)
    // unary minus; modulo; float division
    assert(CypherLite.run(g, "MATCH ()-[e]->() WHERE e.time > -10 RETURN COUNT(*)")
      .first().getLong(0) == 5L)
    val md = CypherLite.run(g,
      "MATCH ()-[e]->() WHERE e.time = 10 RETURN e.time % 20 AS m, e.time / 4 AS q").first()
    assert(md.getLong(0) == 10L && math.abs(md.getDouble(1) - 2.5) < 1e-12)
    // arithmetic grouping key under implicit grouping: a parity cohorts
    val parity = CypherLite.run(g,
      "MATCH (a)-[e]->(b) RETURN a % 2 AS p, COUNT(*) AS n ORDER BY p")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(parity == Seq((0L, 3L), (1L, 2L))) // srcs 1,2,2,3,4
    // unaliased arithmetic items are refused
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) RETURN e.time + 1"))
  }

  test("UNION / UNION ALL combine whole queries with set semantics") {
    // KNOWS dsts {2,3,4} ∪ WORKS dsts {4,1} → distinct {1,2,3,4}
    val u = CypherLite.run(g,
      "MATCH ()-[e:KNOWS]->(b) RETURN b UNION MATCH ()-[e2:WORKS]->(b) RETURN b")
      .collect().map(_.getLong(0)).toSet
    assert(u == Set(1L, 2L, 3L, 4L))
    assert(CypherLite.run(g,
      "MATCH ()-[e:KNOWS]->(b) RETURN b UNION ALL MATCH ()-[e2:WORKS]->(b) RETURN b")
      .count() == 5L)
    // aggregates per part compose: edge counts per layer side by side
    val counts = CypherLite.run(g,
      "MATCH ()-[e:KNOWS]->() RETURN COUNT(*) AS n UNION ALL " +
        "MATCH ()-[f:WORKS]->() RETURN COUNT(*) AS n")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(counts == Seq(2L, 3L))
    // column mismatch and mixed UNION forms are loud
    intercept[IllegalArgumentException](CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) RETURN a UNION MATCH ()-[e2:WORKS]->(b) RETURN b"))
    intercept[IllegalArgumentException](CypherLite.run(g,
      "MATCH ()-[e]->(b) RETURN b UNION MATCH ()-[e2]->(b) RETURN b " +
        "UNION ALL MATCH (c) RETURN c AS b"))
  }

  test("two-hop chain ()-[e1]->()-[e2]->() (transpiler :1410s)") {
    // chains: (1→2→3), (1→2→4), (2→3→4), (3→4→1), (4→1→2), (2→4→1)
    val n = CypherLite.run(g, "MATCH ()-[e1]->()-[e2]->() RETURN e1, e2").count()
    assert(n == 6)
    // filter on a hop (transpiler WHERE e1.weight > 5 analog on ts)
    val f = CypherLite.run(
      g, "MATCH (a)-[e1]->(b)-[e2]->(c) WHERE e1.time >= 20 RETURN a, b, c")
    assert(f.columns.toSeq == Seq("a", "b", "c"))
    assert(f.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((2L, 3L, 4L), (3L, 4L, 1L), (4L, 1L, 2L), (2L, 4L, 1L)))
  }

  test("reversed and undirected hops ()<-[e]-(), ()-[r]-() (transpiler :1229 variants)") {
    // <- reverses: same 5 edges, tail/head swapped
    val rev = CypherLite.run(g, "MATCH (a)<-[e]-(b) RETURN a, b")
    assert(rev.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((2L, 1L), (3L, 2L), (4L, 3L), (1L, 4L), (4L, 2L)))
    // undirected: both orientations — 10 bindings over 5 edges (Cypher semantics)
    assert(CypherLite.run(g, "MATCH ()-[r]-() RETURN r").count() == 10)
    // mixed-direction chain: ()-[e1]->()<-[e2]-()
    val mixed = CypherLite.run(g, "MATCH (a)-[e1]->(b)<-[e2]-(c) WHERE a <> c RETURN a, b, c")
    // in-pairs at shared heads: b=4 has in-edges from 3 and 2 → (3,4,2),(2,4,3); b=others single in-edge
    assert(mixed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((3L, 4L, 2L), (2L, 4L, 3L)))
  }

  test("RETURN * expands the named variables (transpiler :1292,1300)") {
    val rows = CypherLite.run(g, "MATCH (a)-[e]->() RETURN *")
    assert(rows.columns.toSeq == Seq("a", "e_src", "e_dst", "e_ts", "e_event_id", "e_layer"))
    assert(rows.count() == 5)
  }

  test("type(r) AS r aliasing (transpiler :  'RETURN type(r) AS r')") {
    val rows = CypherLite.run(g, "MATCH ()-[r]-() RETURN type(r) AS r")
    assert(rows.columns.toSeq == Seq("r"))
    assert(rows.distinct().collect().map(_.getString(0)).toSet == Set("KNOWS", "WORKS"))
  }

  test("multi-pattern MATCH joins on the shared node variable (transpiler parse_tables_2)") {
    val rows = CypherLite.run(
      g, "MATCH (a)-[e:KNOWS]->(b), (b)-[f:WORKS]->(c) RETURN a, b, c")
    assert(rows.columns.toSeq == Seq("a", "b", "c"))
    val got = rows.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // KNOWS: 1→2, 2→3, 2→4; WORKS: 3→4, 4→1 — join on b
    assert(got == Set((2L, 3L, 4L), (2L, 4L, 1L)))
    // WHERE can span both patterns
    val n = CypherLite.run(
      g,
      "MATCH (a)-[e:KNOWS]->(b), (b)-[f:WORKS]->(c) WHERE e.time < f.time RETURN COUNT(*)")
      .first().getLong(0)
    assert(n == 1L) // only (2,3,4): 20 < 30; (2,4,1) has 60 > 40
  }

  test("disjoint multi-pattern MATCH is a cross join (transpiler parse_tables_2)") {
    val n = CypherLite.run(g, "MATCH (a)-[e:WORKS]->(b), (c) RETURN COUNT(*)")
      .first().getLong(0)
    assert(n == 2L * 4L) // 2 WORKS edges × 4 nodes
  }

  test("implicit grouping: RETURN key, COUNT(...) (transpiler returns :372-437)") {
    val rows = CypherLite.run(
      g, "MATCH (a)-[e]->(b) RETURN a, COUNT(e) AS n, COUNT(DISTINCT b) AS nb ORDER BY a")
    assert(rows.columns.toSeq == Seq("a", "n", "nb"))
    val got = rows.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 1L, 1L), (4L, 1L, 1L)))
    // grouping key can be an edge expression; ORDER BY an aggregate alias
    val byType = CypherLite.run(
      g, "MATCH ()-[e]->() RETURN type(e) AS t, COUNT(*) AS n ORDER BY n DESC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byType == Seq(("KNOWS", 3L), ("WORKS", 2L)))
  }

  test("relationship uniqueness: two rel vars never bind the same edge (unique_edge_filter, transpiler :697-705)") {
    // all-pairs over two unconstrained patterns: 5×5 bindings minus the 5
    // diagonal e=f ones
    assert(CypherLite.run(g, "MATCH (a)-[e]->(b), (c)-[f]->(d) RETURN COUNT(*)")
      .first().getLong(0) == 20L)
    // same static layer: 3×3 − 3
    assert(CypherLite.run(g, "MATCH (a)-[e:KNOWS]->(b), (c)-[f:KNOWS]->(d) RETURN COUNT(*)")
      .first().getLong(0) == 6L)
    // statically distinct layers: filter elided, plain cross of 3×2
    assert(CypherLite.run(g, "MATCH (a)-[e:KNOWS]->(b), (c)-[f:WORKS]->(d) RETURN COUNT(*)")
      .first().getLong(0) == 6L)
    // undirected two-hop through b: Σ_b deg(b)·(deg(b)−1) = 16 once the
    // e=f diagonal (a-b back along the same edge) is excluded — 26 without
    assert(CypherLite.run(g, "MATCH (a)-[e]-(b)-[f]-(c) RETURN COUNT(*)")
      .first().getLong(0) == 16L)
  }

  test("pattern property maps desugar to equality conjuncts (ast.rs props; transpiler :875-917)") {
    val bs = CypherLite.run(g, "MATCH (a {id: 2})-[e]->(b) RETURN b ORDER BY b")
      .collect().map(_.getLong(0)).toSeq
    assert(bs == Seq(3L, 4L))
    val row = CypherLite.run(g, "MATCH (a)-[e {layer: 'KNOWS', time: 20}]->(b) RETURN a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(row == Seq((2L, 3L)))
    // map on an anonymous rel; combined with WHERE
    assert(CypherLite.run(
      g, "MATCH (a)-[{layer: 'WORKS'}]->(b) WHERE b <> 1 RETURN COUNT(*)")
      .first().getLong(0) == 1L)
  }

  test("variable-length hops *a..b expand to a union of fixed chains (openCypher semantics)") {
    // KNOWS 1-hop: (1,2) (2,3) (2,4); 2-hop distinct-edge: 1→2→3, 1→2→4
    val ab = CypherLite.run(g, "MATCH (a)-[:KNOWS*1..2]->(b) RETURN a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ab == Set((1L, 2L), (2L, 3L), (2L, 4L), (1L, 3L), (1L, 4L)))
    assert(CypherLite.run(g, "MATCH (a)-[:KNOWS*1..2]->(b) RETURN COUNT(*)")
      .first().getLong(0) == 5L)
    // `*2` = exactly two hops
    assert(CypherLite.run(g, "MATCH (a)-[:KNOWS*2]->(b) RETURN COUNT(*)")
      .first().getLong(0) == 2L)
    // all-layer 2-hop walks with distinct edges: 1→2→3, 1→2→4, 2→3→4,
    // 3→4→1, 4→1→2, 2→4→1
    assert(CypherLite.run(g, "MATCH (a)-[*2..2]->(b) RETURN COUNT(*) AS n")
      .first().getLong(0) == 6L)
    // implicit grouping over the branch union
    val perB = CypherLite.run(g, "MATCH (a)-[:KNOWS*1..2]->(b) RETURN b, COUNT(*) AS n ORDER BY b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(perB == Seq((2L, 1L), (3L, 2L), (4L, 2L)))
  }

  test("variable-length hop composed with a fixed hop and WHERE") {
    // (a)-KNOWS*1..2->(b)-WORKS->(c): b∈{3,4} ⇒ 4 paths
    val rows = CypherLite.run(
      g, "MATCH (a)-[:KNOWS*1..2]->(b)-[f:WORKS]->(c) RETURN a, b, c, f.time AS t ORDER BY t, a")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 3L, 4L), (2L, 3L, 4L), (1L, 4L, 1L), (2L, 4L, 1L)))
    // WHERE applies across every branch
    assert(CypherLite.run(
      g, "MATCH (a)-[:KNOWS*1..2]->(b)-[f:WORKS]->(c) WHERE a = 1 RETURN COUNT(*)")
      .first().getLong(0) == 2L)
  }

  test("variable-length bounds are validated loudly") {
    // no explicit upper bound
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[:KNOWS*1..]->(b) RETURN a"))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[:KNOWS*]->(b) RETURN a"))
    // min must be ≥ 1, max ≤ MaxVarLenHops, min ≤ max
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[:KNOWS*0..2]->(b) RETURN a"))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[:KNOWS*1..99]->(b) RETURN a"))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[:KNOWS*3..2]->(b) RETURN a"))
    // a var-length relationship cannot bind a variable
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e:KNOWS*1..2]->(b) RETURN e"))
  }

  test("OPTIONAL MATCH left-joins on shared node variables (openCypher semantics)") {
    // KNOWS pairs: (1,2) (2,3) (2,4); b=2 has no outgoing WORKS → null c
    val rows = CypherLite.run(
      g, "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[f:WORKS]->(c) RETURN a, b, c ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(rows == Seq((1L, 2L, -1L), (2L, 3L, 4L), (2L, 4L, 1L)))
    // the optional WHERE filters candidate matches, NEVER the base rows
    val scoped = CypherLite.run(
      g, "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[f:WORKS]->(c) WHERE f.time > 30 " +
        "RETURN a, b, c ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(scoped == Seq((1L, 2L, -1L), (2L, 3L, -1L), (2L, 4L, 1L)))
    // COUNT over an optional rel var skips unmatched rows (Cypher COUNT(f))
    val counts = CypherLite.run(
      g, "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[f:WORKS]->(c) RETURN a, COUNT(f) AS n ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(counts == Seq((1L, 0L), (2L, 2L)))
  }

  test("chained OPTIONAL MATCH clauses; null bindings never match downstream") {
    val rows = CypherLite.run(
      g, "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[f:WORKS]->(c) " +
        "OPTIONAL MATCH (c)-[h:KNOWS]->(d) RETURN a, b, c, d ORDER BY a, b")
      .collect().map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))
      }.toSeq
    // (2,4)→c=1→1-KNOWS→2 = d=2; (2,3)→c=4 has no KNOWS out; (1,2)→c null → d null
    assert(rows == Seq((1L, 2L, -1L, -1L), (2L, 3L, 4L, -1L), (2L, 4L, 1L, 2L)))
  }

  test("OPTIONAL MATCH validation is loud") {
    // no shared node variable
    intercept[IllegalArgumentException](CypherLite.run(
      g, "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (x)-[f:WORKS]->(y) RETURN a"))
    // optional WHERE may only reference the clause's own variables
    intercept[IllegalArgumentException](CypherLite.run(
      g, "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[f:WORKS]->(c) WHERE a = 1 RETURN a"))
    // edge variables are single-bind across the whole query
    intercept[IllegalArgumentException](CypherLite.run(
      g, "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[e:WORKS]->(c) RETURN a"))
  }

  test("WITH: implicit grouping + HAVING-shape WHERE feeding a chained MATCH") {
    // KNOWS out-degrees: 1→1, 2→2; only a=2 survives n > 1; node 2 has two
    // outgoing edges in total
    val rows = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) WITH a, COUNT(e) AS n WHERE n > 1 " +
        "MATCH (a)-[f]->(c) RETURN a, n, COUNT(f) AS total")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq((2L, 2L, 2L)))
  }

  test("WITH rebinds the scope: uncarried variables drop; DISTINCT dedups") {
    // all edge dsts: 2,3,4,1,4 — five rows, four distinct
    assert(CypherLite.run(g, "MATCH ()-[e]->(b) WITH b RETURN COUNT(*) AS n")
      .first().getLong(0) == 5L)
    assert(CypherLite.run(g, "MATCH ()-[e]->(b) WITH DISTINCT b RETURN COUNT(*) AS n")
      .first().getLong(0) == 4L)
    // e went out of scope after WITH b
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH ()-[e]->(b) WITH b RETURN e.time"))
  }

  test("WITH carries and renames edge variables") {
    val rows = CypherLite.run(g,
      "MATCH (a)-[e:WORKS]->(b) WITH e AS w, b RETURN w.time AS t, b ORDER BY t")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((30L, 4L), (40L, 1L)))
  }

  test("WITH ORDER BY + LIMIT is a mid-pipeline top-k") {
    val rows = CypherLite.run(g,
      "MATCH (a)-[e]->(b) WITH b, e.time AS t ORDER BY t DESC LIMIT 2 " +
        "RETURN b, t ORDER BY t")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 40L), (4L, 60L)))
  }

  test("a later MATCH WHERE may reference WITH-projected scalars") {
    // (a, e.time) for KNOWS: (1,10),(2,20),(2,60); f from a with f.time > t:
    // only (2,20) finds e4@60
    val rows = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) WITH a, e.time AS t " +
        "MATCH (a)-[f:KNOWS]->(c) WHERE f.time > t RETURN a, t, f.time AS t2")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq((2L, 20L, 60L)))
  }

  test("WITH global aggregate then disjoint MATCH cross-joins") {
    val rows = CypherLite.run(g,
      "MATCH ()-[e:WORKS]->() WITH COUNT(e) AS w " +
        "MATCH ()-[f:KNOWS]->() RETURN w, COUNT(f) AS k")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 3L)))
  }

  test("WITH * carries the whole scope; WITH *, item appends") {
    assert(CypherLite.run(g,
      "MATCH (a)-[e]->(b) WITH * WHERE e.time > 20 RETURN COUNT(*) AS n")
      .first().getLong(0) == 3L)
    val rows = CypherLite.run(g,
      "MATCH (a)-[e:WORKS]->(b) WITH *, e.time AS t RETURN a, b, t ORDER BY t")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((3L, 4L, 30L), (4L, 1L, 40L)))
  }

  private def props = {
    val session = spark
    import session.implicits._
    Seq((1L, "alice", 10L), (2L, "bob", 20L), (3L, "carol", 30L), (4L, "dave", 40L))
      .toDF("id", "name", "score")
  }

  test("node properties resolve via the props frame in WHERE and RETURN") {
    // KNOWS edges: 1→2, 2→3, 2→4; a.score >= 20 keeps a=2
    val rows = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) WHERE a.score >= 20 RETURN a, b.name AS bn ORDER BY a, bn",
      props).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "carol"), (2L, "dave")))
  }

  test("node properties in WITH items; re-join after a WITH carries the variable") {
    // all edge dsts: 2,3,4,1,4 → names bob, carol, dave×2, alice
    val r2 = CypherLite.run(g,
      "MATCH (a)-[e]->(b) WITH b.name AS bn, COUNT(*) AS n RETURN bn, n ORDER BY bn",
      props).collect()
    assert(r2.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("alice", 1L), ("bob", 1L), ("carol", 1L), ("dave", 2L)))
    // a carried bare through WITH can still reach its properties later
    val r3 = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) WITH a, COUNT(e) AS n WHERE n > 1 " +
        "RETURN a, a.name AS an, n", props).collect()
    assert(r3.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((2L, "bob", 2L)))
  }

  test("node labels (a:Type) desugar onto the node_type property") {
    val session = spark
    import session.implicits._
    val typed = Seq((1L, "user"), (2L, "bot"), (3L, "user"), (4L, "bot"))
      .toDF("id", "node_type")
    // KNOWS sources labeled user: only a=1 (2 is a bot)
    val rows = CypherLite.run(g,
      "MATCH (a:user)-[e:KNOWS]->(b) RETURN a, b ORDER BY a, b", typed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 2L)))
    // both endpoints labeled: bot = {2, 4}; only 2→4 connects them
    val bb = CypherLite.run(g,
      "MATCH (a:bot)-[e]->(b:bot) RETURN a, b", typed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bb == Seq((2L, 4L)))
    // labels compose with WITH pipelines (post-carry segment)
    val post = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) WITH a, b MATCH (b:bot)-[f]->(c) " +
        "RETURN a, b, c ORDER BY a, b, c", typed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(post == Seq((1L, 2L, 3L), (1L, 2L, 4L), (2L, 4L, 1L)))
    // in OPTIONAL MATCH a label filters CANDIDATES, never the base rows:
    // b=4's only successor is 1 (a user) → its base row keeps c null
    val opt = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) OPTIONAL MATCH (b)-[f]->(c:bot) " +
        "RETURN a, b, c ORDER BY a, b", typed)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(opt == Seq((1L, 2L, 4L), (2L, 3L, 4L), (2L, 4L, -1L)))
    // loud: anonymous labeled node, label without a props frame
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (:user)-[e]->(b) RETURN b", typed))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a:user)-[e]->(b) RETURN b"))
  }

  test("node properties: missing node reads null; loud errors otherwise") {
    val partial = props.filter(col("id") =!= 2L)
    val rows = CypherLite.run(g,
      "MATCH (a)-[e:KNOWS]->(b) RETURN b, b.name AS bn ORDER BY b", partial).collect()
    assert(rows.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ==
      Seq((2L, None), (3L, Some("carol")), (4L, Some("dave"))))
    // unknown field is loud and names the known ones
    val e1 = intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) RETURN a.nope", props))
    assert(e1.getMessage.contains("name"))
    // without a props frame the old contract stands
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) RETURN a.name"))
  }

  test("WITH validation is loud") {
    // expressions/aggregates must be aliased
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) WITH e.time MATCH (a)-[f]->(c) RETURN a"))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) WITH a, COUNT(e) MATCH (a)-[f]->(c) RETURN a"))
    // ORDER BY without LIMIT is a no-op — refused
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) WITH a ORDER BY a MATCH (a)-[f]->(c) RETURN a"))
    // DISTINCT cannot combine with aggregates
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) WITH DISTINCT a, COUNT(e) AS n RETURN a, n"))
    // WITH-projected scalars have no fields
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) WITH a, e.time AS t RETURN t.x"))
    // duplicate output names
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) WITH a, b AS a RETURN a"))
  }

  test("malformed queries fail loudly") {
    intercept[IllegalArgumentException](CypherLite.run(g, "MATCH (a)-[e]->(a) RETURN e")) // dup var
    intercept[IllegalArgumentException](CypherLite.run(g, "MATCH ()-[e]->() RETURN e.nope"))
    intercept[IllegalArgumentException](CypherLite.run(g, "MATCH ()-[e]->() WHERE e.time RETURN e"))
    // duplicate EDGE variable across patterns
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b), (b)-[e]->(c) RETURN a"))
    // grouped output: ORDER BY must address a RETURN item
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) RETURN a, COUNT(e) ORDER BY e.time"))
    // property-map values must be literals; node maps expose only id
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a {id: b})-[e]->(b) RETURN a"))
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a {name: 'x'})-[e]->(b) RETURN a"))
  }

  test("UNWIND a literal list: one row per element; chained = cross product") {
    val xs = CypherLite.run(g, "UNWIND [1, 2, 3] AS x RETURN x")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(xs == Seq(1L, 2L, 3L))
    val pairs = CypherLite.run(g, "UNWIND [1, 2] AS x UNWIND [10, 20] AS y RETURN x, y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs == Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L)))
    // empty list → no rows (openCypher)
    assert(CypherLite.run(g, "UNWIND [] AS x RETURN x").count() == 0L)
  }

  test("UNWIND feeds a MATCH: the unwound value is visible in WHERE") {
    // nodes 2 and 3 each have exactly one outgoing KNOWS edge... node 2 has
    // 2→3 and 2→4 (two), node 3 has none outgoing KNOWS (3→4 is WORKS)
    val rows = CypherLite.run(
      g,
      "UNWIND [1, 2] AS x MATCH (a)-[e:KNOWS]->(b) WHERE a = x RETURN x, COUNT(e) AS n ORDER BY x")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 1L), (2L, 2L)))
  }

  test("collect() → UNWIND round trip restores the rows") {
    val rows = CypherLite.run(
      g,
      "MATCH (a)-[e:KNOWS]->(b) WITH a, collect(e.time) AS ts " +
        "UNWIND ts AS t RETURN a, t ORDER BY a, t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 10L), (2L, 20L), (2L, 60L)))
  }

  test("UNWIND then WITH aggregates over the unwound rows") {
    val s = CypherLite.run(
      g,
      "UNWIND [1, 2, 3, 4] AS x WITH SUM(x) AS s RETURN s")
      .first().getLong(0)
    assert(s == 10L)
  }

  test("CASE WHEN: value branches in items, WHERE and grouping keys") {
    // bucket edges by time: <25 → 'early', <45 → 'mid', else 'late'
    val rows = CypherLite.run(
      g,
      "MATCH ()-[e]->() RETURN CASE WHEN e.time < 25 THEN 'early' " +
        "WHEN e.time < 45 THEN 'mid' ELSE 'late' END AS bucket, " +
        "COUNT(*) AS n ORDER BY bucket")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("early", 2L), ("late", 1L), ("mid", 2L)))
    // missing ELSE yields null
    val n = CypherLite.run(
      g,
      "MATCH ()-[e]->() RETURN CASE WHEN e.time < 25 THEN 1 END AS flag, COUNT(*) AS n ORDER BY flag")
    val collected = n.collect()
    assert(collected.length == 2)
    assert(collected.exists(_.isNullAt(0)))
    // CASE composes with arithmetic
    val v = CypherLite.run(
      g,
      "MATCH ()-[e]->() WHERE e.time = 10 RETURN CASE WHEN e.time > 5 THEN 100 ELSE 0 END + 1 AS v")
      .first().getLong(0)
    assert(v == 101L)
  }

  test("scalar functions: coalesce over OPTIONAL MATCH nulls, abs/sign, case/size of strings") {
    // node 3 has no outgoing KNOWS edge → f is null → coalesce falls back
    val rows = CypherLite.run(
      g,
      "MATCH (a)-[e:WORKS]->(b) OPTIONAL MATCH (b)-[f:KNOWS]->(c) " +
        "RETURN a, coalesce(f.time, 0 - 1) AS t ORDER BY a, t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // WORKS: 3→4 (b=4: KNOWS 4→? none → -1), 4→1 (b=1: KNOWS 1→2 t=10)
    assert(rows == Seq((3L, -1L), (4L, 10L)))
    assert(CypherLite.run(g, "MATCH ()-[e]->() WHERE e.time = 10 RETURN abs(e.time - 25) AS d")
      .first().getLong(0) == 15L)
    assert(CypherLite.run(g, "MATCH ()-[e]->() WHERE e.time = 10 RETURN sign(e.time - 25) AS s")
      .first().getLong(0) == -1L)
    val up = CypherLite.run(
      g,
      "MATCH ()-[e]->() RETURN toLower(e.layer) AS l, size(e.layer) AS n ORDER BY l LIMIT 1")
      .first()
    assert(up.getString(0) == "knows" && up.getLong(1) == 5L)
    // conversions
    val conv = CypherLite.run(
      g,
      "MATCH ()-[e]->() WHERE e.time = 10 " +
        "RETURN toString(e.time) AS s, toInteger(e.time / 3) AS i, trim(e.layer) AS l")
      .first()
    assert(conv.getString(0) == "10" && conv.getLong(1) == 3L && conv.getString(2) == "KNOWS")
    // a fn name not followed by ( is still a plain variable
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH ()-[e]->() RETURN abs"))
  }

  test("CASE validation is loud") {
    // simple-form CASE is refused
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH ()-[e]->() RETURN CASE e.time WHEN 10 THEN 1 END AS x"))
    // missing END
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH ()-[e]->() RETURN CASE WHEN e.time > 5 THEN 1 AS x"))
  }

  test("EXISTS pattern predicate is a semi join on shared node variables") {
    // KNOWS edges: 1→2, 2→3, 2→4; b has outgoing WORKS only for b=3 (3→4)
    // and b=4 (4→1)
    val rows = CypherLite.run(
      g,
      "MATCH (a)-[e:KNOWS]->(b) WHERE EXISTS { MATCH (b)-[f:WORKS]->(c) } " +
        "RETURN a, b ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((2L, 3L), (2L, 4L)))
    // NOT EXISTS is the anti-join complement
    val anti = CypherLite.run(
      g,
      "MATCH (a)-[e:KNOWS]->(b) WHERE NOT EXISTS { (b)-[f:WORKS]->(c) } " +
        "RETURN a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(anti == Seq((1L, 2L)))
    // the inner WHERE scopes to the subpattern: only 4→1 (t=40) passes
    val inner = CypherLite.run(
      g,
      "MATCH (a)-[e:KNOWS]->(b) WHERE EXISTS { (b)-[f:WORKS]->(c) WHERE f.time > 35 } " +
        "RETURN a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inner == Seq((2L, 4L)))
    // EXISTS composes with plain conjuncts and row multiplicity is kept
    val mixed = CypherLite.run(
      g,
      "MATCH (a)-[e:KNOWS]->(b) WHERE e.time > 15 AND EXISTS { (b)-[f:WORKS]->(c) } " +
        "RETURN COUNT(*) AS n")
      .first().getLong(0)
    assert(mixed == 2L)
  }

  test("pattern predicates (b)-[:L]->() desugar to EXISTS (openCypher 9)") {
    val rows = CypherLite.run(
      g,
      "MATCH (a)-[e:KNOWS]->(b) WHERE (b)-[f:WORKS]->(c) RETURN a, b ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((2L, 3L), (2L, 4L)))
    val anti = CypherLite.run(
      g,
      "MATCH (a)-[e:KNOWS]->(b) WHERE NOT (b)-[f:WORKS]->(c) RETURN a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(anti == Seq((1L, 2L)))
    // boolean groups still parse: a leading paren NOT followed by a dash
    assert(CypherLite.run(
      g,
      "MATCH (a)-[e]->(b) WHERE (e.time > 15 AND e.time < 45) OR a = 1 RETURN COUNT(*) AS n")
      .first().getLong(0) == 4L)
  }

  test("EXISTS validation is loud") {
    // EXISTS under OR is refused (it is a join, not a Column)
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) " +
        "WHERE e.time > 0 OR EXISTS { (b)-[f:WORKS]->(c) } RETURN a"))
    // no shared variable
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) " +
        "WHERE EXISTS { (x)-[f:WORKS]->(y) } RETURN a"))
  }

  test("UNWIND validation is loud") {
    // alias collides with a carried variable
    intercept[IllegalArgumentException](
      CypherLite.run(g, "MATCH (a)-[e]->(b) WITH a, collect(e.time) AS ts " +
        "UNWIND ts AS a RETURN a"))
    // missing AS
    intercept[IllegalArgumentException](
      CypherLite.run(g, "UNWIND [1, 2] x RETURN x"))
    // unknown variable as the list
    intercept[IllegalArgumentException](
      CypherLite.run(g, "UNWIND zs AS x RETURN x"))
  }
}
