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

  /**
   * Gopher-style repetition signals (Rae et al. 2021 §A1.1): per document,
   *  - `dup_line_frac` / `dup_line_char_frac`: fraction of lines (and of
   *    their characters) that are repeats of an earlier identical line;
   *  - `top_2gram_char_frac` / `top_3gram_char_frac`: characters covered by
   *    the most frequent word n-gram (occurrences × n-gram length / doc
   *    length);
   *  - `dup_5gram_char_frac`: characters covered by 5-grams occurring more
   *    than once (overlaps counted per occurrence, so boilerplate-heavy
   *    docs can exceed 1 — threshold accordingly).
   *
   * The n-gram tallies run as explode → partial-agg groupBy on
   * (doc, n, gram) — the 100 TB shape (map-side combine, one shuffle keyed
   * by gram), NOT a per-row O(tokens²) most-frequent-element lambda.
   *
   * @return (idCol, n_chars, dup_line_frac, dup_line_char_frac,
   *         top_2gram_char_frac, top_3gram_char_frac, dup_5gram_char_frac)
   */
  /**
   * Character-trigram language-model quality score — the CCNet-style
   * "perplexity against a reference corpus" filter (Wenzek et al. 2020
   * train KenLM on Wikipedia; here the LM is a char-trigram model with
   * add-k smoothing trained IN-PLAN on `refDocs`, so the whole pipeline
   * stays relational and oracle-replayable; a deployment swaps `refDocs`
   * for a curated reference slice).
   *
   * Text is normalized (lowercase, non-alnum runs → single space) before
   * trigram extraction. Score per doc = avg over trigram positions of
   * log((count₃ + k) / (count₂ + k·V)) where V = |distinct normalized
   * chars| in the reference; perplexity = exp(−avg). Lower perplexity =
   * more reference-like.
   *
   * The 100 TB shape: the model is bounded by the alphabet (≤ |Σ|³ rows —
   * tens of KB), so scoring is two BROADCAST joins against the corpus
   * trigram census; the only wide exchange is the per-doc score
   * re-aggregation, carrying one row per (doc, distinct trigram).
   *
   * @return (idCol, n_trigrams, avg_logp, perplexity)
   */
  def lmQuality(
      docs: DataFrame,
      refDocs: DataFrame = null,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Double = 0.1): DataFrame = {
    val ref = Option(refDocs).getOrElse(docs)
    def norm(c: Column) =
      regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", " "), "^ | $", "")
    def grams(df: DataFrame, n: Int, out: String) = df
      .select(col(idCol).as("id"), norm(col(textCol)).as("t"))
      .filter(length(col("t")) >= n)
      .select(col("id"), explode(expr(
        s"transform(sequence(1, length(t) - ${n - 1}), i -> substring(t, i, $n))")).as(out))
    // reference model: trigram and bigram counts + alphabet size
    val tri = grams(ref, 3, "g").groupBy("g").agg(count(lit(1)).as("c3"))
    val bi = grams(ref, 2, "g2").groupBy("g2").agg(count(lit(1)).as("c2"))
    val vocab = grams(ref, 1, "ch").select(count_distinct(col("ch")).as("v"))
    // score: per doc, every trigram position (grouped by distinct trigram
    // with its in-doc multiplicity — same sum, fewer join rows)
    grams(docs, 3, "g")
      .groupBy(col("id"), col("g"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(tri), Seq("g"), "left")
      .withColumn("g2", substring(col("g"), 1, 2))
      .join(broadcast(bi), Seq("g2"), "left")
      .crossJoin(broadcast(vocab))
      .select(
        col("id"),
        col("n"),
        (col("n") * log(
          (coalesce(col("c3"), lit(0L)) + lit(k)) /
            (coalesce(col("c2"), lit(0L)) + lit(k) * col("v")))).as("lp"))
      .groupBy("id")
      .agg(sum("n").as("n_trigrams"), (sum("lp") / sum("n")).as("avg"))
      .select(
        col("id").as(idCol),
        col("n_trigrams"),
        round(col("avg"), 6).as("avg_logp"),
        round(exp(-col("avg")), 6).as("perplexity"))
  }

  def repetitionSignals(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = docs.select(
      col(idCol).as("id"),
      length(col(textCol)).cast("long").as("n_chars"),
      split(col(textCol), "\n").as("lines"))
    val lineSignals = lines
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("n_dlines", size(array_distinct(col("lines"))).cast("long"))
      .withColumn("chars_all", expr(
        "aggregate(transform(lines, l -> length(l)), 0L, (s, v) -> s + v)"))
      .withColumn("chars_distinct", expr(
        "aggregate(transform(array_distinct(lines), l -> length(l)), 0L, (s, v) -> s + v)"))
      .select(
        col("id"), col("n_chars"),
        round((col("n_lines") - col("n_dlines")).cast("double") /
          greatest(col("n_lines"), lit(1L)), 6).as("dup_line_frac"),
        round((col("chars_all") - col("chars_distinct")).cast("double") /
          greatest(col("n_chars"), lit(1L)), 6).as("dup_line_char_frac"))

    def gramDf(n: Int) = docs.select(
      col(idCol).as("id"),
      length(col(textCol)).cast("long").as("nc"),
      lit(n).as("n"),
      explode(Dedup.shingles(textCol, n)).as("g"))
    val counted = gramDf(2)
      .unionByName(gramDf(3))
      .unionByName(gramDf(5))
      .groupBy("id", "n", "g")
      .agg(count(lit(1)).as("cnt"), first(col("nc")).as("nc"))
    def topFrac(n: Int) = round(
      coalesce(max(when(col("n") === n, col("cnt") * length(col("g")))), lit(0L))
        .cast("double") / greatest(first(col("nc")), lit(1L)), 6)
    val gramSignals = counted
      .groupBy("id")
      .agg(
        topFrac(2).as("top_2gram_char_frac"),
        topFrac(3).as("top_3gram_char_frac"),
        round(
          coalesce(sum(when(col("n") === 5 && col("cnt") >= 2, col("cnt") * length(col("g")))),
            lit(0L)).cast("double") / greatest(first(col("nc")), lit(1L)), 6)
          .as("dup_5gram_char_frac"))

    lineSignals
      .join(gramSignals, Seq("id"))
      .withColumnRenamed("id", idCol)
  }

  /** The stopwords Gopher's "minimum stopword" rule checks for. */
  private val gopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-style word-level quality signals and the combined pass rule
   * (Rae et al. 2021 §A1.1): word count in [minWords, maxWords], mean word
   * length in [3, 10], symbol-to-word ratio (# and …) < 0.1, < 90% of
   * lines bullet-led, < 30% ellipsis-ended, > 80% of words with an
   * alphabetic character, ≥ 2 of the 8 required stopwords present.
   * All pure column expressions.
   */
  def gopherSignals(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Long = 50L,
      maxWords: Long = 100000L): DataFrame = {
    val words = split(col(textCol), "\\s+")
    val lines = split(col(textCol), "\n")
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
    val nWords = size(words).cast("long")
    val out = docs.select(
      col(idCol),
      nWords.as("n_words"),
      round(
        expr(s"aggregate(transform(split($textCol, '\\\\s+'), w -> length(w)), 0L, (s, v) -> s + v)")
          .cast("double") / greatest(nWords, lit(1L)), 6).as("mean_word_len"),
      round(
        (regexp_count(col(textCol), lit("#")) +
          regexp_count(col(textCol), lit("\\.\\.\\.")) +
          regexp_count(col(textCol), lit("…"))).cast("double") /
          greatest(nWords, lit(1L)), 6).as("symbol_word_ratio"),
      round(
        expr(s"size(filter(split($textCol, '\n'), l -> trim(l) rlike '^[-*•]'))")
          .cast("double") / greatest(size(lines), lit(1)), 6).as("bullet_line_frac"),
      round(
        expr(s"size(filter(split($textCol, '\n'), l -> l rlike '\\\\.\\\\.\\\\.$$|…$$'))")
          .cast("double") / greatest(size(lines), lit(1)), 6).as("ellipsis_line_frac"),
      round(
        expr(s"size(filter(split($textCol, '\\\\s+'), w -> w rlike '[a-zA-Z]'))")
          .cast("double") / greatest(nWords, lit(1L)), 6).as("alpha_word_frac"),
      gopherStopwords
        .map(w => when(padded.contains(s" $w "), 1).otherwise(0))
        .reduce(_ + _).cast("long").as("stopword_hits"))
    out.withColumn(
      "gopher_pass",
      col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_word_ratio") < 0.1 &&
        col("bullet_line_frac") < 0.9 &&
        col("ellipsis_line_frac") < 0.3 &&
        col("alpha_word_frac") > 0.8 &&
        col("stopword_hits") >= 2L)
  }

  /**
   * C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep lines with
   * at least `minWordsPerLine` words that (optionally) end in terminal
   * punctuation, and drop lines containing a curly brace, "lorem ipsum" or
   * "javascript". Returns the document with its cleaned text and the
   * kept/total line accounting (the drops are the observable, per the
   * repo-wide guardrail rule).
   *
   * @return (idCol, n_lines, n_kept, clean_text)
   */
  def c4Clean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minWordsPerLine: Int = 5,
      requireTerminalPunct: Boolean = true): DataFrame = {
    val punctCond =
      if (requireTerminalPunct) " AND trim(l) rlike '[.!?\"]$'" else ""
    // plain-string concatenation: Scala "\\n"/"\\\\s+" emit the SQL
    // literals '\n'/'\\s+', which the SQL parser unescapes to a newline
    // and the \s+ regex (the s-interpolator would process escapes even in
    // triple quotes and mangle the double backslash)
    val keepExpr =
      "filter(split(" + textCol + ", '\\n'), " +
        "l -> size(split(trim(l), '\\\\s+')) >= " + minWordsPerLine +
        punctCond +
        " AND NOT l like '%{%' AND NOT lower(l) like '%lorem ipsum%'" +
        " AND NOT lower(l) like '%javascript%')"
    docs.select(
      col(idCol),
      size(split(col(textCol), "\n")).cast("long").as("n_lines"),
      size(expr(keepExpr)).cast("long").as("n_kept"),
      array_join(expr(keepExpr), "\n").as("clean_text"))
  }

  // ---------- hashed-feature linear quality classifier ----------

  /** Weight scale for [[classifierScore]]: integer weights live in
    * [−(W−1)/2, (W−1)/2] so token sums stay exact longs. */
  private val ClassifierW = 1000003L

  /**
   * fastText-style linear quality classifier over hashed bag-of-words
   * features (the shape of every production "quality classifier" pre-filter
   * — CCNet's fastText LM filter, GPT-3's WebText-vs-Common-Crawl LR):
   * tokens hash into `dim` feature buckets with the portable polynomial
   * family, each bucket carries a weight, and the document score is the
   * mean token weight.
   *
   * The weights here are derived deterministically from the bucket index —
   * the TRAINED-MODEL PLUG-IN BOUNDARY, exactly like PQ's sampled codebook:
   * swap in a learned (bucket → weight) table (one broadcast join) and the
   * rest of the plan is unchanged. What this operator makes real and
   * testable is the scale-shaped plumbing: tokenize → hash → weight-sum as
   * ONE explode + partial-aggregated groupBy(doc) (the exchange carries one
   * row per document, not per token, because sum/count combine map-side).
   *
   * Determinism: weights are INTEGERS summed as longs (order-independent,
   * unlike a float sum), so the score — one final double division, then
   * 6dp rounding — replays bit-identically in the DuckDB oracle.
   *
   * @return (idCol, n_tokens, score, keep) — score ∈ [−1, 1], keep =
   *         score > 0 (the usual threshold-at-margin rule)
   */
  def classifierScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      dim: Int = 4096,
      seed: Long = 42L): DataFrame = {
    require(dim > 0 && dim <= (1 << 20), s"dim=$dim out of (0, 2^20]")
    val half = (ClassifierW - 1) / 2 // 500001: |w| ≤ half exactly
    // bucket = polyhash(lower token) mod dim; w(b) = centered Knuth-hash
    // of (b + seed) — every intermediate < 2^62 ((b + seed) < 2^22,
    // times 2654435761 < 2^32 stays < 2^54), so no ANSI overflow
    val s = ((seed % ClassifierW) + ClassifierW) % ClassifierW
    val tok = docs
      .select(col(idCol).as("id"), explode(split(lower(col(textCol)), "\\s+")).as("tk"))
      .filter(col("tk") =!= "")
      .withColumn("b", expr(s"pmod(${graft.ml.Dedup.polyHashSql("tk")}, $dim)"))
      .withColumn("w", expr(s"(b + $s) * 2654435761 % $ClassifierW - $half"))
    tok
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("raw"))
      .select(
        col("id").as(idCol),
        col("n_tokens"),
        round(col("raw").cast("double") / (col("n_tokens") * half.toDouble), 6)
          .as("score"),
        (col("raw") > 0).as("keep"))
  }

  /** Shared counting stage of [[ngramCensus]] / [[ngramOrderStats]]:
    * lowercase whitespace tokens, ONE posexplode + ONE per-document window
    * pass computing max(orders)-1 leads, every order's gram assembled from
    * the same lead row (null when the document ends early) and exploded,
    * then the corpus-scale `groupBy(n, gram)` with map-side partial
    * aggregation. Document frequency is a count-distinct expand on the
    * same keys — only built when asked for, it doubles the pre-aggregation
    * stream. Returns (n, gram, cnt[, doc_freq]). */
  private def ngramCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      orders: Seq[Int],
      withDocFreq: Boolean): DataFrame = {
    require(orders.nonEmpty && orders.forall(n => n >= 1 && n <= 8), s"orders=$orders out of [1,8]")
    val maxN = orders.max
    val tok = docs
      .select(
        col(idCol).as("id"),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("tk"))
      .select(col("id"), posexplode(col("tk")).as(Seq("pos", "w0")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
    val withLeads = tok.select(
      col("id") +: col("w0") +:
        (1 until maxN).map(i => lead("w0", i).over(w).as(s"w$i")): _*)
    val gramArr = array(orders.map { n =>
      struct(
        lit(n).as("n"),
        when(
          col(s"w${n - 1}").isNotNull,
          concat_ws(" ", (0 until n).map(i => col(s"w$i")): _*)).as("gram"))
    }: _*)
    val grams = withLeads
      .select(col("id"), explode(gramArr).as("og"))
      .select(col("id"), col("og.n").as("n"), col("og.gram").as("gram"))
      .filter(col("gram").isNotNull)
    val aggs =
      if (withDocFreq) Seq(count(lit(1)).as("cnt"), countDistinct("id").as("doc_freq"))
      else Seq(count(lit(1)).as("cnt"))
    grams.groupBy("n", "gram").agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Distributed word n-gram census — the counting pass of an n-gram
   * language model (the KenLM `lmplz` count step, Heafield 2011) and the
   * usual corpus-inspection table (top collocations per order).
   *
   * Tokens are lowercase whitespace words; for each order in `orders` it
   * counts every n-gram's corpus occurrences and document frequency, and
   * returns the global top-`topK` per order ranked by (count desc, gram
   * asc — deterministic at the boundary).
   *
   * Shape at scale (one plan, no persist, no recompute): tokenize +
   * posexplode once; ONE window pass per document computes the
   * `max(orders)-1` token leads; every order's gram is assembled from the
   * same lead row and exploded (one row per (token, order)); then a single
   * wordcount-shape `groupBy(n, gram)` with map-side partial aggregation
   * carries the corpus-scale exchange (doc frequency rides along as a
   * count-distinct expand on the same keys). The per-order top-k never
   * funnels the corpus-sized count table into `|orders|` partitions: a
   * first row_number over (n, salt-of-gram) keeps ≤ topK rows per salt
   * bucket, and only the surviving `|orders|·saltBuckets·topK` rows meet
   * the final per-order window.
   *
   * @return (n, gram, cnt, doc_freq, rank), rank 1..topK within each n
   */
  def ngramCensus(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      orders: Seq[Int] = Seq(1, 2, 3),
      topK: Int = 100,
      saltBuckets: Int = 64): DataFrame = {
    require(topK >= 1 && saltBuckets >= 1, "topK and saltBuckets must be >= 1")
    val counts = ngramCounts(docs, idCol, textCol, orders, withDocFreq = true)
    val byCount = Seq(col("cnt").desc, col("gram").asc)
    val phase1 = counts
      .withColumn("__salt", pmod(xxhash64(col("gram")), lit(saltBuckets.toLong)))
      .withColumn(
        "__r1",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("n", "__salt").orderBy(byCount: _*)))
      .filter(col("__r1") <= topK)
      .drop("__salt", "__r1")
    phase1
      .withColumn(
        "rank",
        row_number()
          .over(org.apache.spark.sql.expressions.Window.partitionBy("n").orderBy(byCount: _*))
          .cast("long"))
      .filter(col("rank") <= topK)
      .select(col("n").cast("long").as("n"), col("gram"), col("cnt"), col("doc_freq"), col("rank"))
  }

  /**
   * Per-order n-gram summary statistics over the same census: total gram
   * instances, distinct grams (vocabulary size at that order), hapax
   * legomena (count-1 grams — the mass Kneser–Ney discounting keys on),
   * and the modal gram's count. One extra tiny aggregate over the census
   * counts; same corpus-scale shape as [[ngramCensus]].
   *
   * @return (n, total_grams, distinct_grams, hapax_grams, max_cnt)
   */
  def ngramOrderStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      orders: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    ngramCounts(docs, idCol, textCol, orders, withDocFreq = false)
      .groupBy("n")
      .agg(
        sum("cnt").as("total_grams"),
        count(lit(1)).as("distinct_grams"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax_grams"),
        max("cnt").as("max_cnt"))
      .select(
        col("n").cast("long").as("n"),
        col("total_grams"), col("distinct_grams"), col("hapax_grams"), col("max_cnt"))
  }
}
