package graft.streaming

import graft.SparkSpec
import graft.data.TranscriptGen
import graft.graph.EdgeBuilder
import graft.sources.GraphStore
import graft.streaming.Sessionize.{advance, emptyState, ConvState, Turn}

import java.nio.file.Files
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  private def t(idx: Int, role: String = "user", tool: Option[String] = None, ts: Long = 0L) =
    Turn("c1", idx, role, tool, if (ts == 0L) 1000L + idx * 1000L else ts)

  // ---- pure transition function ----

  test("dense in-order turns link eagerly with O(1) state") {
    val (links, st) = advance(emptyState, Seq(t(0), t(1), t(2)), flush = false)
    assert(links.map(l => (l.src_turn_idx, l.dst_turn_idx, l.layer)) ==
      Seq((0, 1, "reply"), (1, 2, "reply")))
    assert(st.pending.isEmpty && st.last.map(_.turn_idx).contains(2))
    // next batch continues the chain across the batch boundary
    val (links2, st2) = advance(st, Seq(t(3)), flush = false)
    assert(links2.map(l => (l.src_turn_idx, l.dst_turn_idx)) == Seq((2, 3)))
    assert(st2.pending.isEmpty)
  }

  test("out-of-order arrivals within a batch sort before linking") {
    val (links, st) = advance(emptyState, Seq(t(2), t(0), t(1)), flush = false)
    assert(links.map(l => (l.src_turn_idx, l.dst_turn_idx)) == Seq((0, 1), (1, 2)))
    assert(st.pending.isEmpty)
  }

  test("a gap holds later turns until flush, then links like the batch builder") {
    val (links, st) = advance(emptyState, Seq(t(0), t(1), t(3)), flush = false)
    assert(links.map(l => (l.src_turn_idx, l.dst_turn_idx)) == Seq((0, 1)))
    assert(st.pending.map(_.turn_idx) == Seq(3)) // waiting for turn 2
    // timeout: absent turn 2 resolves to linking present neighbours 1 -> 3
    val (flushed, st2) = advance(st, Seq.empty, flush = true)
    assert(flushed.map(l => (l.src_turn_idx, l.dst_turn_idx)) == Seq((1, 3)))
    assert(st2.pending.isEmpty && st2.last.map(_.turn_idx).contains(3))
  }

  test("assistant tool call meeting its result adds a tool-layer edge") {
    val a = t(0, role = "assistant", tool = Some("search"))
    val r = t(1, role = "tool", tool = Some("search"))
    val (links, _) = advance(emptyState, Seq(a, r), flush = false)
    assert(links.map(_.layer) == Seq("reply", "tool"))
    assert(links.forall(l => l.ts == r.ts_ms && l.event_id == 1L))
    // mismatched tool name: reply only
    val r2 = t(1, role = "tool", tool = Some("other"))
    val (links2, _) = advance(emptyState, Seq(a, r2), flush = false)
    assert(links2.map(_.layer) == Seq("reply"))
  }

  test("stale replays at or below the linked frontier are dropped") {
    val (_, st) = advance(emptyState, Seq(t(0), t(1)), flush = false)
    val (links, st2) = advance(st, Seq(t(0), t(1), t(2)), flush = false)
    assert(links.map(l => (l.src_turn_idx, l.dst_turn_idx)) == Seq((1, 2)))
    assert(st2.pending.isEmpty)
  }

  test("advance is arrival-order and batch-split invariant (200 random cases)") {
    val rnd = new scala.util.Random(42)
    for (iter <- 1 to 200) {
      val n = 2 + rnd.nextInt(12)
      val turns = (0 until n).map { i =>
        val role = rnd.nextInt(3) match {
          case 0 => "assistant"
          case 1 => "tool"
          case _ => "user"
        }
        val tool = if (rnd.nextBoolean()) Some(s"t${rnd.nextInt(2)}") else None
        t(i, role = role, tool = tool)
      }
      // model: one in-order batch, flushed — equals the batch builder by
      // the dense/tool tests above
      val expected = advance(emptyState, turns, flush = true)._1
        .sortBy(l => (l.src_turn_idx, l.layer))

      // random arrival order, random batch split, flush at the end
      var st = emptyState
      val out = Seq.newBuilder[Sessionize.Link]
      var rest = rnd.shuffle(turns.toList)
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(rest.size)
        val (batch, tail) = rest.splitAt(k)
        val (links, ns) = advance(st, batch, flush = false)
        out ++= links
        st = ns
        rest = tail
      }
      out ++= advance(st, Seq.empty, flush = true)._1
      val got = out.result().sortBy(l => (l.src_turn_idx, l.layer))
      assert(got == expected, s"case $iter: turns=$turns")
    }
  }

  // ---- streaming end to end ----

  test("conversations split across micro-batch restarts match the batch builder") {
    val in = Files.createTempDirectory("graft-sess-in").toString
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString
    val storeDir = Files.createTempDirectory("graft-sess-store").toString
    val store = new GraphStore(storeDir, spark)

    val all = TranscriptGen.transcripts(spark, 20).cache()
    // drop 1: each conversation's first 3 turns; drop 2: the rest — every
    // conversation with >3 turns SPANS the two streaming runs. Lateness
    // must cover the cross-conversation time spread: drop 2 replays rows
    // whose event times sit behind run 1's global watermark, and the engine
    // drops stateful-op input older than the watermark.
    val wide = "3650 days"
    all.filter(col("turn_idx") < 3).write.mode("overwrite").parquet(in)
    Sessionize.start(spark, in, store, ckpt, lateness = wide).awaitTermination(120000)
    all.filter(col("turn_idx") >= 3).write.mode("append").parquet(in)
    Sessionize.start(spark, in, store, ckpt, lateness = wide).awaitTermination(120000)

    val streamed = store.read()
    val batch = EdgeBuilder.edges(all)
    assert(streamed.countTemporalEdges() == batch.count())
    assert(
      streamed.edges.select("src", "dst", "ts", "event_id", "layer").exceptAll(
        batch.select("src", "dst", "ts", "event_id", "layer")).count() == 0)
    all.unpersist()
  }

  test("session timeout flushes a gappy conversation once the watermark passes") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-sess2-in").toString
    val ckpt = Files.createTempDirectory("graft-sess2-ckpt").toString
    val storeDir = Files.createTempDirectory("graft-sess2-store").toString
    val store = new GraphStore(storeDir, spark)

    def row(conv: String, idx: Int, ts: Long) =
      (conv, idx, "user", s"turn $idx", null.asInstanceOf[String], new java.sql.Timestamp(ts))
    val base = 1700000000000L
    // gappy: turns 0,1,3 (2 never arrives); filler conversation far in the
    // future pushes the watermark past gappy's session timeout
    val drop1 = Seq(
      row("gappy", 0, base), row("gappy", 1, base + 1000), row("gappy", 3, base + 3000),
      row("filler", 0, base + 3600 * 1000))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    drop1.write.mode("overwrite").parquet(in)
    Sessionize.start(spark, in, store, ckpt, lateness = "0 seconds", sessionGapMs = 5000L)
      .awaitTermination(120000)
    // the data batch eagerly links 0 -> 1 and holds 3; the watermark then
    // advances past gappy's timeout (filler's far-future ts) and Spark runs
    // a trailing zero-data batch in the SAME AvailableNow run, firing the
    // flush: absent turn 2 resolves to linking present neighbours 1 -> 3
    def gappy() = store.read().edges.filter(col("conv_id") === "gappy")
      .select("src_turn_idx", "dst_turn_idx").as[(Int, Int)].collect().toSet
    assert(gappy() == Set((0, 1), (1, 3)))

    // a later run must not duplicate or relink anything
    Seq(row("filler", 1, base + 3601 * 1000))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .write.mode("append").parquet(in)
    Sessionize.start(spark, in, store, ckpt, lateness = "0 seconds", sessionGapMs = 5000L)
      .awaitTermination(120000)
    assert(gappy() == Set((0, 1), (1, 3)))
    assert(store.read().edges.filter(col("conv_id") === "gappy").count() == 2)
  }
}
