package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation: language id,
 * quality scoring, token counting, document fingerprinting. All pure
 * column expressions (codegen'd, UDF-free).
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column =
    size(split(textCol, "\\s+")).cast("long")

  /** BPE-ish subword count estimate: words + extra splits at case/digit
    * boundaries (a cheap, deterministic proxy for a real tokenizer; the
    * container has no tokenizer libs). Boundaries are counted as
    * non-overlapping two-char class-pair matches — exactly equivalent to
    * lookaround boundary positions because the classes are disjoint (no two
    * adjacent boundaries share a pattern), and unlike lookarounds this is
    * RE2-compatible so the DuckDB oracle can replay it. */
  def subwordCountEstimate(textCol: Column): Column =
    (size(split(textCol, "\\s+")) +
      regexp_count(textCol, lit("[a-z][A-Z]")) +
      regexp_count(textCol, lit("[A-Za-z][0-9]")) +
      regexp_count(textCol, lit("[0-9][A-Za-z]")))
      .cast("long")

  /** Document fingerprint over normalized content (md5 — portable across
    * engines for oracle replay; collision-safe for dedup purposes). */
  def fingerprint(textCol: Column): Column =
    md5(regexp_replace(lower(textCol), "[^a-z0-9]", ""))

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "fr" -> Seq("le", "et", "la", "les", "est"),
    "es" -> Seq("el", "y", "la", "los", "es"))

  /** Stopword-hit n-gram heuristic language id: language with the most
    * stopword hits wins; 'unknown' when nothing hits. */
  def langId(textCol: Column): Column = {
    val padded = concat(lit(" "), lower(textCol), lit(" "))
    def hits(words: Seq[String]): Column =
      words.map(w => when(padded.contains(s" $w "), 1).otherwise(0)).reduce(_ + _)
    val scored = stopwords.toSeq.map { case (lang, words) => (lang, hits(words)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(lit("unknown")) { case (acc, (lang, h)) =>
      when(h > 0 && h === best && acc === "unknown", lang).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1] from length / punctuation /
    * alpha-ratio / repetition signals (the usual cheap pre-filters). */
  def qualityScore(textCol: Column): Column = {
    val len = length(textCol).cast("double")
    val nTokens = size(split(textCol, "\\s+")).cast("double")
    val alpha = length(regexp_replace(lower(textCol), "[^a-z ]", "")).cast("double")
    val distinctTokens = size(array_distinct(split(lower(textCol), "\\s+"))).cast("double")
    val lengthOk = when(len.between(20, 20000), 1.0).otherwise(0.3)
    val alphaRatio = alpha / greatest(len, lit(1.0))
    val diversity = distinctTokens / greatest(nTokens, lit(1.0))
    round((lengthOk * 0.4 + alphaRatio * 0.3 + diversity * 0.3), 6)
  }

  /** All signals as a struct-per-column DataFrame transform. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_subwords", subwordCountEstimate(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
      .withColumn("pred_lang", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
}
