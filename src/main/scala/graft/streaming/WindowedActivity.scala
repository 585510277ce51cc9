package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked windowed aggregation over a live edge stream — the
 * Structured-Streaming counterpart of the batch rolling/expanding window
 * sets ([[graft.graph.TemporalGraph.rolling]]): instead of re-scanning the
 * edge table per window, the stream maintains per-(window, node) partial
 * aggregates in the state store and emits each window exactly once, when
 * the event-time watermark passes its end (append mode).
 *
 * Reference anchor: the reference's live-graph path answers windowed degree
 * / activity queries against the in-memory temporal index as events arrive
 * (raphtory/src/db/api/view/time.rs rolling + live `add_edge`); here the
 * same question is a continuous query, with state bounded by
 * watermark + window length rather than the whole history.
 *
 * Scale notes:
 *  - the two endpoint rows per edge come from one `explode` of a 2-struct
 *    array (one scan of the source — no streaming self-union);
 *  - distinct-neighbour counts use `approx_count_distinct` (HLL):
 *    mergeable, constant-size state — exact distinct is not available in
 *    streaming aggregation, and at 100 TB the sketch is what you'd want
 *    anyway;
 *  - state per key is one aggregation buffer; keys expire as the watermark
 *    passes, so state size ~ live windows × active nodes, not history.
 */
object WindowedActivity {

  /**
   * Per-node sliding-window activity: for each (window, node) —
   * total incident events, out-events, and approximate distinct
   * neighbours.
   *
   * @param edges    streaming frame with `src`, `dst` and event-time
   *                 `tsCol` (timestamp)
   * @param window   window length, e.g. "10 minutes"
   * @param slide    slide interval (== `window` for tumbling)
   * @param lateness watermark delay bounding state and late data
   * @return append-mode streaming frame
   *         (w_start, w_end, id, events, out_events, approx_neighbours)
   */
  def nodeActivity(
      edges: DataFrame,
      window: String,
      slide: String,
      lateness: String,
      tsCol: String = "ts"): DataFrame = {
    val endpoints = edges
      .withWatermark(tsCol, lateness)
      .select(
        col(tsCol).as("__ts"),
        explode(array(
          struct(col("src").as("id"), col("dst").as("nbr"), lit(true).as("out")),
          struct(col("dst").as("id"), col("src").as("nbr"), lit(false).as("out"))))
          .as("e"))
      .select(col("__ts"), col("e.id"), col("e.nbr"), col("e.out"))
    endpoints
      .groupBy(
        org.apache.spark.sql.functions.window(col("__ts"), window, slide),
        col("id"))
      .agg(
        count(lit(1)).as("events"),
        sum(when(col("out"), 1L).otherwise(0L)).as("out_events"),
        approx_count_distinct("nbr").as("approx_neighbours"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("id"), col("events"), col("out_events"), col("approx_neighbours"))
  }

  /** Global per-window edge rate: (w_start, w_end, edges,
    * approx_active_nodes). Tumbling windows of `window` length. */
  def edgeRate(
      edges: DataFrame,
      window: String,
      lateness: String,
      tsCol: String = "ts"): DataFrame =
    edges
      .withWatermark(tsCol, lateness)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(
        count(lit(1)).as("edges"),
        approx_count_distinct(concat_ws("|", col("src"), col("dst")))
          .as("approx_distinct_pairs"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("edges"), col("approx_distinct_pairs"))
}
