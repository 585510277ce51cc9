package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Full-text search — the Spark counterpart of the reference's Tantivy
 * index layer (raphtory/src/search/: `Searcher::search_nodes/search_edges`
 * evaluate composite property filters against per-property indexes with a
 * `_tokenized` field per text property, plus limit/offset pagination).
 *
 * Instead of an embedded index engine, the index IS a DataFrame — the
 * natural shape at 100 TB, where an inverted index is a parquet table
 * bucketed by term, built once and incrementally unioned:
 *
 *  - [[tokenize]]: lowercase alphanumeric runs (Tantivy's default
 *    SimpleTokenizer + LowerCaser semantics);
 *  - [[buildIndex]]: postings `(term, id, tf)` + per-doc length — one
 *    explode + one (term, id) aggregate;
 *  - [[searchAll]]: conjunctive term match (Tantivy's AND of term
 *    queries) with deterministic id-ordered limit/offset pagination,
 *    matching `search_nodes(filter, limit, offset)`;
 *  - [[searchRanked]]: disjunctive match ranked by BM25 (k1=1.2, b=0.75)
 *    — Tantivy's scoring family — as one postings join + one aggregate.
 *
 * Scale: queries touch only the matched terms' postings (a semi-join on
 * the term key — partition pruning when the index is written bucketed by
 * term); no full-corpus scan at query time.
 */
object TextSearch {

  /** Lowercased alphanumeric tokens. */
  def tokenize(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Inverted index: one row per (term, id) with term frequency and the
    * document's token length (for BM25 normalization). */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), tokenize(col(textCol)).as("toks"))
      .select(col("id"), explode(col("toks")).as("term"), size(col("toks")).as("doc_len"))
    toks
      .groupBy("term", "id")
      .agg(count(lit(1)).as("tf"), first(col("doc_len")).as("doc_len"))
  }

  /** Conjunctive search: documents containing ALL query terms, paginated
    * deterministically by id (the reference's limit/offset contract).
    * @return (id) rows. */
  def searchAll(index: DataFrame, terms: Seq[String], limit: Int, offset: Int): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val uniq = terms.map(_.toLowerCase).distinct
    val matched = index
      .filter(col("term").isin(uniq: _*))
      .groupBy("id")
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === uniq.length)
      .select("id")
      .orderBy("id")
    // offset/limit stay IN the plan (Spark's logical Offset + Limit fold
    // into one bounded TakeOrdered at execution) — the result is never
    // round-tripped through the driver, so offset ≫ 10⁵ costs a bounded
    // top-k, not a driver materialization.
    val page = if (offset > 0) matched.offset(offset) else matched
    page.limit(limit)
  }

  /** Keyset-paginated conjunctive search: the next `limit` matches with
    * `id > afterId` (pass the last id of the previous page; None = first
    * page). Deep paging the offset way still sorts and skips every
    * preceding match; here the cursor is a plain filter on the postings
    * scan — it prunes BELOW the group-by, so page 10⁶ costs the same
    * bounded top-k as page 1. Mirrors Tantivy's searcher resuming from a
    * doc-id cursor rather than re-walking skipped hits. */
  def searchAllAfter(
      index: DataFrame,
      terms: Seq[String],
      limit: Int,
      afterId: Option[Any] = None): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val uniq = terms.map(_.toLowerCase).distinct
    val base = index.filter(col("term").isin(uniq: _*))
    val pruned = afterId.fold(base)(a => base.filter(col("id") > lit(a)))
    pruned
      .groupBy("id")
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === uniq.length)
      .select("id")
      .orderBy("id")
      .limit(limit)
  }

  // ---- composite / prefix / fuzzy search (searcher.rs:30-62 parity) ----

  /** One term clause of a composite query — Tantivy's term / prefix /
    * fuzzy query kinds (the reference's filter model feeds these through
    * `NodeFilterExecutor`). */
  sealed trait TermQuery
  object TermQuery {
    /** Exact token match. */
    final case class Exact(term: String) extends TermQuery
    /** Any token starting with `prefix` (Tantivy PhrasePrefix/RegexQuery
      * slice). */
    final case class Prefix(prefix: String) extends TermQuery
    /** Any token within Levenshtein distance `maxDist` (Tantivy
      * FuzzyTermQuery). The distance runs over the DISTINCT term
      * dictionary — tiny relative to the postings, the same shape as
      * Tantivy walking its FST — never over raw documents. */
    final case class Fuzzy(term: String, maxDist: Int) extends TermQuery
  }

  /** Distinct doc ids with at least one token matching the clause. */
  private def clauseIds(index: DataFrame, q: TermQuery): DataFrame = {
    val matched = q match {
      case TermQuery.Exact(t)    => index.filter(col("term") === t.toLowerCase)
      case TermQuery.Prefix(p)   => index.filter(col("term").startsWith(p.toLowerCase))
      case TermQuery.Fuzzy(t, d) =>
        index.filter(levenshtein(col("term"), lit(t.toLowerCase)) <= d)
    }
    matched.select("id").distinct()
  }

  /**
   * Composite search — the reference's `search_nodes(filter, limit,
   * offset)` (searcher.rs:30-45) over a document table: the conjunction of
   * term clauses (exact / prefix / fuzzy) AND an arbitrary property
   * predicate over the table's columns (the [[graft.rel.Predicates]]
   * algebra — the analog of the composite property-filter tree Tantivy
   * evaluates against its per-property indexes). Results are the matching
   * document rows, deterministically id-paginated.
   *
   * Plan shape: each clause is a semi-joinable id set off the postings
   * (term-pruned — no corpus scan); the property predicate pushes into the
   * document scan; the conjunction is a chain of semi-joins on id.
   */
  def searchFiltered(
      docs: DataFrame,
      idCol: String,
      index: DataFrame,
      clauses: Seq[TermQuery],
      propertyFilter: Option[Column] = None,
      limit: Int = Int.MaxValue,
      offset: Int = 0): DataFrame = {
    val filtered = propertyFilter.fold(docs)(docs.filter)
    val matched = clauses.foldLeft(filtered) { (acc, q) =>
      acc.join(
        clauseIds(index, q).withColumnRenamed("id", idCol),
        Seq(idCol),
        "left_semi")
    }
    val sorted = matched.orderBy(col(idCol))
    val page = if (offset > 0) sorted.offset(offset) else sorted
    if (limit != Int.MaxValue) page.limit(limit) else page
  }

  /** BM25-ranked disjunctive search (k1 = 1.2, b = 0.75): score =
    * Σ_terms idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgLen)),
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)). @return top-k (id, score). */
  def searchRanked(index: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val uniq = terms.map(_.toLowerCase).distinct
    val stats = index
      .agg(
        countDistinct(col("id")).as("n_docs"),
        (sum(col("tf")) / countDistinct(col("id"))).as("avg_len"))
    val df = index
      .filter(col("term").isin(uniq: _*))
      .groupBy("term")
      .agg(countDistinct(col("id")).as("df"))
    index
      .filter(col("term").isin(uniq: _*))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn(
        "idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn(
        "w",
        col("idf") * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("doc_len") / col("avg_len"))))
      .groupBy("id")
      .agg(sum(col("w")).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
