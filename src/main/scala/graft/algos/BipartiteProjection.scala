package graft.algos

import graft.graph.TemporalGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Temporal bipartite projection (reference
 * raphtory/src/algorithms/projections/temporal_bipartite_projection.rs:31):
 * given a two-mode graph (primary nodes ↔ middle nodes), connect two
 * primary nodes iff they interact with the same middle node within `delta`
 * of each other; the projected edge carries the later of the two event
 * times.
 *
 * Spark plan: per-middle-node self-join of the primary-incident events with
 * the |Δt| ≤ delta band predicate — the shuffle key is the middle node, so
 * skew concentrates on hub middles; the `maxPerMiddle` guardrail drops
 * pathological hubs with a count (the standard bound for quadratic
 * per-group joins).
 *
 * @param isPrimary predicate over node ids (as a DataFrame of primary ids)
 */
object BipartiteProjection {

  /** Primary-incident event rows (middle, p, ts) with per-middle counts. */
  private def sizedIncident(g: TemporalGraph, primaryIds: DataFrame): DataFrame = {
    val prim = primaryIds.select(col(primaryIds.columns.head).as("pid"))
    val e = g.edges.select(col("src"), col("dst"), col("ts"))
    val fromPrimary = e
      .join(prim, e("src") === col("pid"), "left_semi")
      .select(col("dst").as("middle"), col("src").as("p"), col("ts"))
    val toPrimary = e
      .join(prim, e("dst") === col("pid"), "left_semi")
      .select(col("src").as("middle"), col("dst").as("p"), col("ts"))
    fromPrimary.union(toPrimary).distinct()
      .withColumn(
        "mn",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("middle")))
  }

  /** Guardrail accounting: (middle, mn) for middles the cap drops — the
    * drops are first-class output, never a silent filter. */
  def droppedMiddles(
      g: TemporalGraph,
      primaryIds: DataFrame,
      maxPerMiddle: Long = 100000L): DataFrame =
    sizedIncident(g, primaryIds)
      .filter(col("mn") > maxPerMiddle)
      .groupBy("middle")
      .agg(first("mn").as("mn"))

  def run(
      g: TemporalGraph,
      primaryIds: DataFrame,
      deltaMs: Long,
      maxPerMiddle: Long = 100000L): DataFrame = {
    // hub-middle guardrail: the per-middle self-join below is quadratic,
    // so middles above the cap are cut — [[droppedMiddles]] reports them
    val bounded = sizedIncident(g, primaryIds)
      .filter(col("mn") <= maxPerMiddle)
      .drop("mn")

    val l = bounded.select(col("middle"), col("p").as("a"), col("ts").as("ta"))
    val r = bounded.select(col("middle"), col("p").as("b"), col("ts").as("tb"))
    l.join(r, Seq("middle"))
      .filter(col("a") < col("b") && abs(col("ta") - col("tb")) <= deltaMs)
      .select(col("a").as("src"), col("b").as("dst"), greatest(col("ta"), col("tb")).as("ts"))
      .distinct()
  }
}
