package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming document deduplication — the continuous-ingest counterpart of
 * [[graft.ml.Dedup.exact]]/[[graft.ml.Dedup.normalized]] for a training-data
 * pipeline that ingests a document stream: keep the FIRST arrival of each
 * content fingerprint, drop every later duplicate.
 *
 * Built on Structured Streaming's `dropDuplicatesWithinWatermark`, so the
 * fingerprint state store is BOUNDED by the event-time watermark instead of
 * growing forever (the plain streaming `dropDuplicates` keeps all keys for
 * the life of the query — a guaranteed OOM on an unbounded corpus): a
 * duplicate arriving within `delay` of the first copy's event time is
 * always dropped; one arriving after the watermark has passed the first
 * copy may be re-admitted. That is the standard watermark contract — at
 * 100 TB the delay is sized to the ingestion lateness SLA and a periodic
 * batch [[graft.ml.Dedup.exact]] pass sweeps the long tail.
 *
 * State is keyed by the 128-bit md5 fingerprint, NOT the text, so the
 * store holds ~48 bytes/doc regardless of document size.
 */
object StreamingDedup {

  /**
   * Deduplicate a streaming document frame.
   *
   * @param docs       streaming DataFrame with `textCol` and an event-time
   *                   column `tsCol` (timestamp type)
   * @param delay      watermark delay bounding both lateness and dedup
   *                   state retention
   * @param normalized fingerprint lowercased/alnum-only content instead of
   *                   exact bytes (the [[graft.ml.Dedup.normalized]] rule)
   * @return the input rows minus watermark-window duplicates, with the
   *         `fp` fingerprint column added
   */
  def dedupExact(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      delay: String = "10 minutes",
      normalized: Boolean = false): DataFrame = {
    val fp =
      if (normalized) md5(regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""))
      else md5(col(textCol))
    docs
      .withColumn("fp", fp)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
  }
}
