package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.graph.EdgeBuilder
import graft.sources.GraphStore

/**
 * Stateful cross-batch sessionization — the piece [[StreamingIngest]]
 * declares out of scope: conversations whose turns arrive SPLIT ACROSS
 * micro-batches (or files, or days). The reference's live path appends
 * events one at a time into per-node temporal indexes
 * (raphtory/src/db/api/mutation/addition_ops.rs:198-301), so a conversation
 * growing across ingest calls still links correctly; this is the Structured
 * Streaming counterpart, built on `flatMapGroupsWithState` keyed by
 * conv_id with event-time timeouts against the watermark.
 *
 * Semantics target exact parity with the batch [[EdgeBuilder]]:
 *  - turns of one conversation link consecutively under the stable order
 *    `(turn_idx, ts)` → `reply` edges; assistant→tool pairs carrying the
 *    same tool name add a `tool` edge — identical layers, timestamps and
 *    event_ids to the batch builder;
 *  - turns with DENSE indices link EAGERLY (turn k emits as soon as k−1 is
 *    linked), so steady-state per-conversation state is one turn, not the
 *    whole history — a conversation with 10⁶ turns holds O(1) state;
 *  - out-of-order / gappy arrivals buffer until the conversation times out
 *    (no new turns before the watermark passes last-seen-ts + sessionGap),
 *    then link in `(turn_idx, ts)` order exactly like the batch window —
 *    a turn that never arrives links its neighbours to each other, which
 *    is precisely what the batch builder does for an absent row.
 *
 * Scale: state is per-conversation (the natural well-distributed key);
 * the state store shuffles by conv_id once per batch; eager emission keeps
 * state O(1) per live conversation, and event-time timeout bounds straggler
 * state to the watermark horizon.
 *
 * Watermark contract (standard Structured Streaming semantics): rows whose
 * event time is older than the watermark are dropped by the engine before
 * they reach the stateful operator — `lateness` must cover the real
 * out-of-orderness of the feed, including the CROSS-conversation spread
 * when historical conversations are backfilled next to live ones.
 */
object Sessionize {

  /** One transcript turn (ts in epoch millis). */
  final case class Turn(conv_id: String, turn_idx: Int, role: String, tool: Option[String], ts_ms: Long)

  /** A linked consecutive pair, pre node-id hashing (src/dst surrogate ids
    * are applied as COLUMNS afterwards so the hash is byte-identical to
    * [[EdgeBuilder.nodeId]]). */
  final case class Link(
      conv_id: String,
      src_turn_idx: Int,
      dst_turn_idx: Int,
      ts: Long,
      event_id: Long,
      layer: String)

  /** Per-conversation state: the last linked turn + out-of-order buffer. */
  final case class ConvState(last: Option[Turn], pending: Seq[Turn])

  val emptyState: ConvState = ConvState(None, Seq.empty)

  private def order(t: Turn): (Int, Long) = (t.turn_idx, t.ts_ms)

  /** Edges for one adjacent pair — mirrors the batch builder's two layers:
    * reply always; tool when an assistant tool call meets its result. */
  private def pairLinks(p: Turn, c: Turn): Seq[Link] = {
    val reply = Link(c.conv_id, p.turn_idx, c.turn_idx, c.ts_ms, c.turn_idx.toLong, "reply")
    val tool =
      if (c.role == "tool" && p.role == "assistant" && c.tool.nonEmpty && p.tool == c.tool)
        Seq(Link(c.conv_id, p.turn_idx, c.turn_idx, c.ts_ms, c.turn_idx.toLong, "tool"))
      else Seq.empty
    reply +: tool
  }

  /**
   * Pure transition function (unit-tested directly): fold `incoming` into
   * `state`, emitting links. Eager mode (`flush = false`) only links the
   * contiguous-index run (exact batch parity for dense indices — the common
   * case — while unresolved gaps wait); `flush = true` links everything
   * present in `(turn_idx, ts)` order (batch parity for gappy
   * conversations, applied at session timeout).
   */
  def advance(state: ConvState, incoming: Seq[Turn], flush: Boolean): (Seq[Link], ConvState) = {
    // drop stale replays: anything at or below the already-linked frontier
    val fresh = state.last match {
      case Some(p) => incoming.filter(_.turn_idx > p.turn_idx)
      case None    => incoming
    }
    val buf = (state.pending ++ fresh).distinct.sortBy(order)
    if (flush) {
      val chain = state.last.toSeq ++ buf
      val links = chain.sliding(2).collect { case Seq(p, c) => pairLinks(p, c) }.flatten.toSeq
      (links, ConvState(chain.lastOption, Seq.empty))
    } else {
      var last = state.last
      var rest = buf
      val out = Seq.newBuilder[Link]
      var advanced = true
      while (advanced && rest.nonEmpty) {
        advanced = false
        val head = rest.head
        last match {
          case None if head.turn_idx == 0 =>
            last = Some(head); rest = rest.tail; advanced = true
          case Some(p) if head.turn_idx == p.turn_idx + 1 =>
            out ++= pairLinks(p, head)
            last = Some(head); rest = rest.tail; advanced = true
          case _ => // gap: hold until flush
        }
      }
      (out.result(), ConvState(last, rest))
    }
  }

  /** The flatMapGroupsWithState callback. */
  private def process(gapMs: Long)(
      key: String,
      rows: Iterator[Turn],
      st: GroupState[ConvState]): Iterator[Link] = {
    if (st.hasTimedOut) {
      val (links, _) = advance(st.getOption.getOrElse(emptyState), Seq.empty, flush = true)
      // session over: REMOVE the state. Keeping the last turn (as earlier
      // versions did) retains one Turn per conversation ever seen — state
      // unbounded in distinct conv_ids on a continuous stream. Removal is
      // the sessionization contract: a conversation resuming after the gap
      // starts a new chain (its first resumed turn buffers until the next
      // flush rather than linking back across the expired session).
      st.remove()
      links.iterator
    } else {
      val turns = rows.toSeq
      val (links, ns) = advance(st.getOption.getOrElse(emptyState), turns, flush = false)
      st.update(ns)
      val maxTs = (ns.last.map(_.ts_ms).toSeq ++ ns.pending.map(_.ts_ms)).foldLeft(0L)(math.max)
      // fire once no turn arrives for `gapMs` in event time; must be set
      // strictly past the current watermark
      st.setTimeoutTimestamp(math.max(maxTs + gapMs, st.getCurrentWatermarkMs() + 1))
      links.iterator
    }
  }

  /** Typed turn stream from the raw transcript frame. */
  def turns(transcripts: DataFrame): Dataset[Turn] = {
    val spark = transcripts.sparkSession
    import spark.implicits._
    transcripts.select(
      col("conv_id"),
      col("turn_idx"),
      col("role"),
      col("tool"),
      unix_millis(col("ts").cast("timestamp_ltz")).as("ts_ms")).as[Turn]
  }

  /** Linked edges with the SAME schema as [[EdgeBuilder.edges]] — node ids
    * are hashed with the same `xxhash64` columns, so downstream consumers
    * (TemporalGraph, GraphStore) cannot tell streamed edges from batch. */
  def edges(linked: Dataset[Link]): DataFrame =
    linked.select(
      EdgeBuilder.nodeId(col("conv_id"), col("src_turn_idx")).as("src"),
      EdgeBuilder.nodeId(col("conv_id"), col("dst_turn_idx")).as("dst"),
      col("ts"),
      col("event_id"),
      col("layer"),
      col("conv_id"),
      col("src_turn_idx"),
      col("dst_turn_idx"))

  /** Apply the stateful linker to a (streaming) turn Dataset. `lateness` is
    * the watermark delay; `sessionGapMs` the quiet period after which a
    * conversation's out-of-order buffer is flushed. */
  def link(
      in: Dataset[Turn],
      lateness: String = "10 minutes",
      sessionGapMs: Long = 30 * 60 * 1000L): Dataset[Link] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", lateness)
      .as[Turn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(sessionGapMs))
  }

  /**
   * End-to-end ingest: watch `inputDir` for transcript parquet drops, link
   * turns statefully across micro-batches, commit edge batches to `store`
   * (effectively-once via the batchId-keyed WAL, like [[StreamingIngest]]).
   */
  def start(
      spark: SparkSession,
      inputDir: String,
      store: GraphStore,
      checkpointDir: String,
      lateness: String = "10 minutes",
      sessionGapMs: Long = 30 * 60 * 1000L,
      availableNow: Boolean = true): StreamingQuery = {
    val stream = spark.readStream
      .schema(StreamingIngest.transcriptSchema)
      .parquet(inputDir)
    val linked = link(turns(stream), lateness, sessionGapMs)
    val writer = linked.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Link], batchId: Long) =>
        val e = edges(batch)
        if (!e.isEmpty) store.appendAs(e, batchId)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
