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
    // offset+limit rows ordered by id; the tail slice is the offset page.
    // (A driver-side slice of a bounded top-k, not a full sort.)
    val page = matched.limit(offset + limit).collect().drop(offset)
    val session = index.sparkSession
    session.createDataFrame(
      session.sparkContext.parallelize(page.toIndexedSeq, 1),
      matched.schema)
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
