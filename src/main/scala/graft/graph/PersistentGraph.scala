package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Persistent-graph time semantics (reference PersistentSemantics,
 * raphtory/src/db/api/view/internal/time_semantics/persistent_semantics.rs:31-64
 * and the deletion-aware graph view db/graph/views/deletion_graph.rs): an
 * edge is *alive strictly before t* iff its last addition event before t is
 * later than its last deletion event before t — with events ordered by the
 * EventTime pair `(ts, event_id)` (raphtory-api timeindex.rs:28).
 *
 * Additions and deletions are both edge-event tables in the engine schema
 * `(src, dst, ts, event_id, layer, ...)`. The alive check is one
 * groupBy-per-(src,dst,layer) max over each table plus a join — fully
 * partial-aggregated, shuffle keyed on the logical edge.
 */
final case class PersistentGraph(additions: TemporalGraph, deletions: DataFrame) {

  private val key = Seq("src", "dst", "layer")

  /** Logical edges alive strictly before t (reference alive_before):
    * (src, dst, layer, ts, event_id) of the last addition. */
  def aliveBefore(t: Long): DataFrame = {
    val lastAdd = additions.edges
      .filter(col("ts") < t)
      .groupBy(key.map(col): _*)
      .agg(max(struct(col("ts"), col("event_id"))).as("last_add"))
    val lastDel = deletions
      .filter(col("ts") < t)
      .groupBy(key.map(col): _*)
      .agg(max(struct(col("ts"), col("event_id"))).as("last_del"))
    lastAdd
      .join(lastDel, key, "left")
      .filter(col("last_del").isNull || col("last_add") > col("last_del"))
      .select(
        col("src"),
        col("dst"),
        col("layer"),
        col("last_add.ts").as("ts"),
        col("last_add.event_id").as("event_id"))
  }

  /** Snapshot at t for persistent graphs = alive at time t inclusive
    * (reference snapshot_at = at(t) for persistent graphs; inclusion of
    * events exactly at t ⇒ alive_before(t+1)). */
  def snapshotAt(t: Long): TemporalGraph = TemporalGraph(aliveBefore(t + 1))

  /** Only never-deleted-since-last-addition entities at the end of time —
    * the reference's ValidGraph view (db/graph/views/valid_graph.rs:23). */
  def valid(): TemporalGraph = TemporalGraph(aliveBefore(Long.MaxValue))
}
