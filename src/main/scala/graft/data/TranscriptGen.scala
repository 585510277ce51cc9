package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Deterministic, seeded synthesizer of multi-turn agent transcripts with the
 * exact shape required by the north rule's input hint:
 * `(conv_id: string, turn_idx: int, role: string, text: string, tool: string,
 * ts: timestamp)`.
 *
 * All randomness is derived from `xxhash64` of (seed, conv_id, turn_idx, tag)
 * columns — no driver-side RNG, no wall clock — so the same (seed, numConvs)
 * always yields byte-identical data at any parallelism. Generation is fully
 * columnar: `spark.range` → per-conversation hashing → `explode(sequence(...))`
 * for turns → one window over `conv_id` for cumulative timestamps. The only
 * shuffle is the per-conversation window, keyed by the natural partition key.
 *
 * Shape notes (mirrors the reference's loader-facing datasets under
 * raphtory/src/graph_loader/, and FIXTURES.md §A):
 *  - turns per conversation: 2..33 baseline, with every `longConvEvery`-th
 *    conversation stretched to `longConvTurns` turns — the heavy tail that
 *    exercises skew/salting paths downstream;
 *  - roles: plain conversations alternate user/assistant; "toolish"
 *    conversations cycle user → assistant(tool call) → tool(result) →
 *    assistant;
 *  - `tool` is set on the invoking assistant turn and its tool-result turn
 *    (same tool name on both, derived from the invocation turn);
 *  - `ts` is monotone non-decreasing per conversation with deliberate
 *    duplicate timestamps (zero gaps) to exercise the (ts, turn_idx)
 *    tie-break mandated by the reference's EventTime secondary index
 *    (raphtory-api/src/core/storage/timeindex.rs:28).
 */
object TranscriptGen {

  private val Words: Seq[String] = Seq(
    "the", "a", "of", "to", "and", "in", "is", "it", "you", "that", "was",
    "for", "on", "are", "with", "as", "his", "they", "be", "at", "one",
    "have", "this", "from", "or", "had", "by", "hot", "word", "but", "what",
    "some", "we", "can", "out", "other", "were", "all", "there", "when",
    "up", "use", "your", "how", "said", "an", "each", "she", "which", "do",
    "their", "time", "if", "will", "way", "about", "many", "then", "them",
    "write", "would", "like", "so", "these")

  /**
   * @param numConvs      number of conversations to synthesize
   * @param seed          hash seed; same seed → identical table
   * @param longConvEvery every k-th conversation is a long (skewed) one
   * @param longConvTurns turn count of long conversations
   */
  def transcripts(
      spark: SparkSession,
      numConvs: Long,
      seed: Long = 42L,
      longConvEvery: Long = 101L,
      longConvTurns: Int = 1200): DataFrame = {
    import spark.implicits._

    val convs = spark
      .range(numConvs)
      .withColumn("conv_id", format_string("conv-%08d", $"id"))
      .withColumn("ch", xxhash64(lit(seed), $"conv_id"))
      .withColumn(
        "n_turns",
        when(pmod($"id", lit(longConvEvery)) === lit(longConvEvery - 1), lit(longConvTurns))
          .otherwise((lit(2) + pmod($"ch", lit(32))).cast("int")))
      .withColumn("toolish", pmod($"ch", lit(3)) === 0)

    val turns = convs
      .select(
        $"conv_id",
        $"toolish",
        $"ch",
        explode(sequence(lit(0), $"n_turns" - 1)).as("turn_idx"))

    val withRole = turns
      .withColumn(
        "role",
        when(
          $"toolish",
          element_at(
            array(lit("user"), lit("assistant"), lit("tool"), lit("assistant")),
            pmod($"turn_idx", lit(4)).cast("int") + 1))
          .otherwise(when(pmod($"turn_idx", lit(2)) === 0, lit("user")).otherwise(lit("assistant"))))
      // Tool name keyed off the *invocation* turn so the assistant call turn
      // (phase 1) and the tool-result turn (phase 2) carry the same tool.
      .withColumn(
        "invoke_idx",
        when(pmod($"turn_idx", lit(4)) === 1, $"turn_idx")
          .when(pmod($"turn_idx", lit(4)) === 2, $"turn_idx" - 1))
      .withColumn(
        "tool",
        when(
          $"toolish" && $"invoke_idx".isNotNull,
          format_string("tool_%02d", pmod(xxhash64(lit(seed), $"conv_id", $"invoke_idx", lit("tool")), lit(16))))
          .otherwise(lit(null).cast("string")))

    val withText = withRole
      .withColumn("wh", xxhash64(lit(seed), $"conv_id", $"turn_idx", lit("text")))
      .withColumn("n_words", (lit(5) + pmod($"wh", lit(24))).cast("int"))
      .withColumn("__words", array(Words.map(lit): _*))
      .withColumn(
        "text",
        expr(
          "concat_ws(' ', transform(sequence(0, n_words - 1), " +
            "i -> element_at(__words, cast(pmod(xxhash64(wh, i), 64) as int) + 1)))"))

    val gapW = Window.partitionBy("conv_id").orderBy("turn_idx")
    val withTs = withText
      .withColumn("gh", xxhash64(lit(seed), $"conv_id", $"turn_idx", lit("ts")))
      // ~20% zero gaps → duplicate timestamps within a conversation.
      .withColumn("gap_s", when(pmod($"gh", lit(5)) === 0, lit(0L)).otherwise(pmod($"gh", lit(240))))
      .withColumn(
        "ts",
        timestamp_seconds(
          lit(1700000000L) + pmod($"ch", lit(86400L * 365)) + sum($"gap_s").over(gapW)))

    withTs.select($"conv_id", $"turn_idx".cast("int").as("turn_idx"), $"role", $"text", $"tool", $"ts")
  }
}
