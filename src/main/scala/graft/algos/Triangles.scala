package graft.algos

import graft.graph.TemporalGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Exact triangle counting. The reference counts, per node, intersections of
 * forward-neighbour sets {t ∈ distinct undirected nbrs : t > v}
 * (raphtory/src/algorithms/motifs/triangle_count.rs:64-116, after a 2-core
 * prefilter). Any acyclic orientation of the undirected simple graph counts
 * each triangle exactly once via |N⁺(u) ∩ N⁺(v)| summed over oriented edges;
 * we orient **by (degree, id)** instead of by id — the standard skew
 * defence: a hub of degree D gets out-degree O(√E) instead of D, so the
 * wedge join cannot explode on hot nodes (reference doesn't need this
 * because shared memory makes hub access cheap; at 100 TB we do).
 *
 * Plan: canonical undirected edges (src<dst, self-loops dropped, distinct) →
 * degree orientation → CSR forward adjacency `(node, sorted nbrs)` →
 * oriented edges join adjacency on both endpoints → `array_intersect` size →
 * global sum. Two shuffles (groupBy + join), both on node id.
 */
object Triangles {

  /** Global triangle count. */
  def globalCount(spark: SparkSession, g: TemporalGraph): Long = {
    val r = orientedIntersections(g)
      .agg(sum("common").as("triangles"))
      .first()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Per-node triangle participation counts `(id, triangles)`; nodes in no
    * triangle are absent (join with nodes and coalesce(0) if needed).
    * Matches the reference's local triangle count semantics
    * (algorithms/motifs/local_triangle_count.rs:57): pairs of distinct
    * neighbours connected in either direction. */
  def localCounts(spark: SparkSession, g: TemporalGraph): DataFrame = {
    val tri = triangleRows(g)
    tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("triangles"))
  }

  /** One row per triangle (u, v, w), canonically ordered by the degree
    * orientation. */
  def triangleRows(g: TemporalGraph): DataFrame =
    orientedIntersectionsExploded(g)

  private def orientedEdges(g: TemporalGraph): DataFrame = {
    val und = g.canonicalUndirected // (a, b) with a < b, no self-loops
    val deg = und
      .select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id")
      .agg(count(lit(1)).as("d"))
    // Orient from the smaller (degree, id) endpoint to the larger.
    val e = und
      .join(deg.select(col("id").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("d").as("db")), Seq("b"))
    e.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b"))
        .as("u"),
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a"))
        .as("v"))
  }

  private def orientedIntersections(g: TemporalGraph): DataFrame = {
    val oriented = orientedEdges(g)
    val adj = oriented
      .groupBy(col("u").as("node"))
      .agg(sort_array(collect_list(col("v"))).as("fwd"))
    oriented
      .join(adj.select(col("node").as("u"), col("fwd").as("fu")), Seq("u"))
      .join(adj.select(col("node").as("v"), col("fwd").as("fv")), Seq("v"))
      .select(size(array_intersect(col("fu"), col("fv"))).cast("long").as("common"))
  }

  private def orientedIntersectionsExploded(g: TemporalGraph): DataFrame = {
    val oriented = orientedEdges(g)
    val adj = oriented
      .groupBy(col("u").as("node"))
      .agg(sort_array(collect_list(col("v"))).as("fwd"))
    oriented
      .join(adj.select(col("node").as("u"), col("fwd").as("fu")), Seq("u"))
      .join(adj.select(col("node").as("v"), col("fwd").as("fv")), Seq("v"))
      .select(col("u"), col("v"), explode(array_intersect(col("fu"), col("fv"))).as("w"))
  }
}
