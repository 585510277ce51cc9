package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * A temporal graph together with its node dimension — the engine's surface
 * for the reference's node-type and node-temporal-property views:
 *
 *  - `subgraph_node_types` (db/api/view/graph.rs:114 + graph/views/
 *    node_type_filtered_subgraph.rs): the view keeping only nodes whose
 *    type is in the given set; edges survive iff BOTH endpoints survive;
 *  - node temporal properties (db/api/properties/temporal_props.rs): every
 *    node-update row `(id, ts, <props…>)` is one property event; `history`
 *    / `at` (latest value at-or-before t) / `latest` mirror
 *    `TemporalProp::{iter, at, latest}`;
 *  - node type is NOT temporal in the reference (set on first add,
 *    conflicting later adds are rejected) — [[nodeTypes]] therefore takes
 *    the FIRST non-null type by (ts, then value) per node.
 *
 * `nodes` is any DataFrame with an `id` column (surrogate long, as produced
 * by `Loaders.nodesFromDataFrame`), an optional `ts` (epoch millis) and
 * `node_type`, plus arbitrary property columns. Multiple rows per id are
 * the node's update history.
 *
 * Scale: all views are single semi-joins or one (id)-keyed aggregate; the
 * as-of lookup is a max(struct) hash aggregate, not a window.
 */
final case class PropertyGraph(graph: TemporalGraph, nodes: DataFrame) {

  /** First non-null node type per node (the reference's set-once rule). */
  def nodeTypes: DataFrame =
    nodes
      .filter(col("node_type").isNotNull)
      .groupBy("id")
      .agg(min(struct(col("ts"), col("node_type"))).as("f"))
      .select(col("id"), col("f.node_type").as("node_type"))

  /** The reference's `subgraph_node_types`: nodes of the given types, edges
    * with both endpoints surviving. */
  def subgraphNodeTypes(types: String*): PropertyGraph = {
    val ids = nodeTypes.filter(col("node_type").isin(types: _*)).select("id")
    PropertyGraph(graph.subgraph(ids), nodes.join(ids, Seq("id"), "left_semi"))
  }

  /** Temporal history of one node property: (id, ts, value) rows, null
    * updates dropped (`TemporalProp::iter`). */
  def propertyHistory(prop: String): DataFrame =
    nodes
      .filter(col(prop).isNotNull)
      .select(col("id"), col("ts"), col(prop).as("value"))

  /** As-of lookup: per node, the latest value at-or-before `t`
    * (`TemporalProp::at`). Ties on ts resolve to the larger value —
    * deterministic; the reference breaks ties by secondary event index,
    * which node rows don't carry. */
  def propertyAt(prop: String, t: Long): DataFrame =
    propertyHistory(prop)
      .filter(col("ts") <= t)
      .groupBy("id")
      .agg(max(struct(col("ts"), col("value"))).as("m"))
      .select(col("id"), col("m.ts").as("ts"), col("m.value").as("value"))

  /** Latest value per node (`TemporalProp::latest`). */
  def propertyLatest(prop: String): DataFrame = propertyAt(prop, Long.MaxValue)

  /** Per-node update activity: first/last update time + update count
    * (the node-history slice of the reference's `node.history()`). */
  def nodeHistoryStats: DataFrame =
    nodes
      .groupBy("id")
      .agg(
        min(col("ts")).as("earliest"),
        max(col("ts")).as("latest"),
        count(lit(1)).as("n_updates"))
}
