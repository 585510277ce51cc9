package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Builds the link-graph edge table from a transcript table
 * `(conv_id, turn_idx, role, text, tool, ts)`.
 *
 * Two layers of conv_id-scoped links (north rule):
 *  - `reply`: turn i → next turn of the same conversation, under the stable
 *    total order `(turn_idx, ts)` — a direct analog of the reference's
 *    EventTime `(t, secondary)` ordering
 *    (raphtory-api/src/core/storage/timeindex.rs:28) realized with a single
 *    `lead()` window per conversation;
 *  - `tool`: assistant tool-invocation turn → its tool-result turn (the
 *    immediately following `tool` row carrying the same tool name).
 *
 * Output schema mirrors the reference loader contract `ColumnNames { time,
 * secondary_index, src, dst, layer }`
 * (raphtory/src/arrow_loader/df_loaders/edges.rs:58-66):
 * `(src: long, dst: long, ts: long millis, event_id: long, layer: string,
 * conv_id, src_turn_idx, dst_turn_idx)`; node ids are
 * `xxhash64(conv_id, turn_idx)` surrogates (GID → id mapping of SURVEY §1.2).
 *
 * Scale notes: the only shuffle is the window partitioned by `conv_id` —
 * the natural, well-distributed partition key (skew comes from long
 * conversations, bounded by `longConvTurns`, not from hot keys). Everything
 * downstream consumes the deduped `(src, dst[, layer])` view; the reference
 * collapses multi-edges the same way
 * (db4-storage/src/segments/node/segment.rs:56-73).
 */
object EdgeBuilder {

  def nodeId(convId: org.apache.spark.sql.Column, turnIdx: org.apache.spark.sql.Column) =
    xxhash64(convId, turnIdx.cast("long"))

  def edges(transcripts: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    val t = transcripts
      .select("conv_id", "turn_idx", "role", "tool", "ts")
      .withColumn("next_idx", lead("turn_idx", 1).over(w))
      .withColumn("next_ts", lead("ts", 1).over(w))
      .withColumn("prev_idx", lag("turn_idx", 1).over(w))
      .withColumn("prev_role", lag("role", 1).over(w))
      .withColumn("prev_tool", lag("tool", 1).over(w))

    // Both layers emitted from ONE pass over the windowed frame (0–2 edges
    // per row via explode of the non-null candidates) — a union of two
    // branches would re-run the per-conversation window shuffle twice.
    val replyEdge = when(
      col("next_idx").isNotNull,
      struct(
        col("turn_idx").as("src_turn_idx"),
        col("next_idx").as("dst_turn_idx"),
        unix_millis(col("next_ts").cast("timestamp_ltz")).as("ts"),
        col("next_idx").cast("long").as("event_id"),
        lit("reply").as("layer")))
    val toolEdge = when(
      col("role") === "tool" && col("prev_role") === "assistant" &&
        col("tool").isNotNull && col("prev_tool") === col("tool"),
      struct(
        col("prev_idx").as("src_turn_idx"),
        col("turn_idx").as("dst_turn_idx"),
        unix_millis(col("ts").cast("timestamp_ltz")).as("ts"),
        col("turn_idx").cast("long").as("event_id"),
        lit("tool").as("layer")))

    t.select(
      col("conv_id"),
      explode(filter(array(replyEdge, toolEdge), e => e.isNotNull)).as("e"))
      .select(
        nodeId(col("conv_id"), col("e.src_turn_idx")).as("src"),
        nodeId(col("conv_id"), col("e.dst_turn_idx")).as("dst"),
        col("e.ts").as("ts"),
        col("e.event_id").as("event_id"),
        col("e.layer").as("layer"),
        col("conv_id"),
        col("e.src_turn_idx").as("src_turn_idx"),
        col("e.dst_turn_idx").as("dst_turn_idx"))
  }

  /** Node dimension table: one row per turn with its surrogate id. */
  def nodes(transcripts: DataFrame): DataFrame =
    transcripts
      .withColumn("id", nodeId(col("conv_id"), col("turn_idx")))
      .select("id", "conv_id", "turn_idx", "role", "tool", "ts")
}
