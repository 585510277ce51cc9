package graft.graph

import graft.SparkSpec
import graft.data.TranscriptGen
import org.apache.spark.sql.functions._

/**
 * Edge-builder goldens on a hand-written transcript plus the north rule's
 * per-turn text-equality invariant under stable (turn_idx, ts) ordering.
 */
class EdgeBuilderSpec extends SparkSpec {

  import spark.implicits._

  private val handTranscript = Seq(
    // conv A: user → assistant(tool call) → tool result → assistant
    ("A", 0, "user", "hi", null, 1000L),
    ("A", 1, "assistant", "let me check", "search", 1010L),
    ("A", 2, "tool", "results...", "search", 1010L), // duplicate ts: tie broken by turn_idx
    ("A", 3, "assistant", "here you go", null, 1020L),
    // conv B: plain 2-turn
    ("B", 0, "user", "hello", null, 2000L),
    ("B", 1, "assistant", "hey", null, 2005L),
    // conv C: single turn → no edges
    ("C", 0, "user", "lonely", null, 3000L))

  private def handDf = handTranscript
    .toDF("conv_id", "turn_idx", "role", "text", "tool", "secs")
    .withColumn("ts", timestamp_seconds(col("secs")))
    .drop("secs")

  test("reply + tool layers on the hand-built transcript") {
    val edges = EdgeBuilder
      .edges(handDf)
      .select("conv_id", "src_turn_idx", "dst_turn_idx", "layer")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    val expected = Set(
      ("A", 0, 1, "reply"), ("A", 1, 2, "reply"), ("A", 2, 3, "reply"),
      ("A", 1, 2, "tool"),
      ("B", 0, 1, "reply"))
    assert(edges == expected)
  }

  test("node ids are xxhash64(conv_id, turn_idx) and join back losslessly") {
    val edges = EdgeBuilder.edges(handDf)
    val nodes = EdgeBuilder.nodes(handDf)
    val joined = edges
      .join(nodes.select(col("id").as("src"), col("conv_id").as("nc"), col("turn_idx").as("nt")), Seq("src"))
    assert(joined.filter(col("conv_id") =!= col("nc") || col("src_turn_idx") =!= col("nt")).count() == 0)
  }

  test("per-turn text equality invariant on generated transcripts") {
    val t = TranscriptGen.transcripts(spark, numConvs = 50, longConvEvery = 10, longConvTurns = 80)
    val edges = EdgeBuilder.edges(t)
    // Join edge endpoints back to the transcript: every (conv_id, turn_idx)
    // endpoint must resolve to exactly the original text.
    val byTurn = t.select(col("conv_id"), col("turn_idx"), col("text"))
    val srcJoin = edges
      .join(byTurn.withColumnRenamed("turn_idx", "src_turn_idx"), Seq("conv_id", "src_turn_idx"))
    assert(srcJoin.count() == edges.count(), "every edge src resolves to one transcript row")
    // Round-trip: id → (conv_id, turn_idx) → text must be single-valued.
    val perId = EdgeBuilder.nodes(t).groupBy("id").agg(countDistinct("conv_id", "turn_idx").as("n"))
    assert(perId.filter(col("n") > 1).count() == 0, "no id collisions at this scale")
  }

  test("generator is deterministic and stably ordered") {
    val a = TranscriptGen.transcripts(spark, 20).orderBy("conv_id", "turn_idx").collect()
    val b = TranscriptGen.transcripts(spark, 20).orderBy("conv_id", "turn_idx").collect()
    assert(a.sameElements(b))
    // ts monotone non-decreasing per conversation under turn_idx order, with
    // deliberate duplicates somewhere.
    val t = TranscriptGen.transcripts(spark, 20)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("conv_id").orderBy("turn_idx")
    val viol = t
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .filter(col("prev_ts").isNotNull && col("ts") < col("prev_ts"))
      .count()
    assert(viol == 0)
    val dups = t
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .filter(col("ts") === col("prev_ts"))
      .count()
    assert(dups > 0, "generator must produce duplicate timestamps to exercise tie-breaks")
  }

  test("temporal + layer views compose") {
    val g = TemporalGraph(EdgeBuilder.edges(handDf))
    assert(g.layer("tool").countTemporalEdges() == 1)
    assert(g.layer("reply").countTemporalEdges() == 4)
    // Window [1010s, 1021s) keeps conv A's later edges only.
    val windowed = g.window(1010000L, 1021000L)
    assert(windowed.countTemporalEdges() == 4) // A:0→1(ts1010), 1→2(1010), tool(1010), 2→3(1020)
    assert(g.before(1010000L).countTemporalEdges() == 0)
    assert(g.snapshotAt(1010000L).countTemporalEdges() == 3)
  }
}
