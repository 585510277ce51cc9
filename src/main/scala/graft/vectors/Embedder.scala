package graft.vectors

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/**
 * The embedding-model boundary of the vectors layer (the counterpart of the
 * reference's `EmbeddingFunction` / `CachedEmbeddingModel`,
 * raphtory/src/vectors/embeddings.rs, cache.rs). An embedder maps a document
 * text column to an `array<double>` column INSIDE the plan — embedding is a
 * per-row projection, so at 100 TB it stays embarrassingly parallel,
 * codegen'd, and shuffle-free.
 *
 * A real deployment plugs an ML model in here (e.g. a `mapInPandas` batch
 * over a served model — the same boundary pattern as
 * [[graft.ml.Multimodal]]'s decode stub, since no model runtime ships in
 * this container). [[HashEmbedder]] is the deterministic built-in: a
 * hash-projected bag-of-words embedding. It is a STAND-IN for a learned
 * model (it captures token overlap, not meaning) but it is a REAL
 * embedding pipeline — tokenize → token id → per-dimension pseudo-random
 * projection → sum — and its `portable = true` mode uses only integer
 * arithmetic both Spark and DuckDB evaluate identically, which lets the
 * driver's oracle replay an end-to-end semantic search.
 */
trait Embedder {
  def dim: Int

  /** Embed the document column named `docCol` → `array<double>`. */
  def embed(docCol: String): Column
}

/**
 * Deterministic hash bag-of-words embedder.
 *
 * doc → lowercase alphanumeric tokens → token value v(t) = polynomial char
 * hash mod 1e9+7 → emb[i] = Σ_tokens comp(v, i), where comp is a
 * hash-uniform value in [-1, 1) at 1e-6 resolution:
 *  - default: xxhash64-derived (fast, codegen'd);
 *  - portable: the same LCG family as [[graft.ml.Similarity.portablePlaneSql]]
 *    so DuckDB replays it bit-exactly (token order is preserved on both
 *    sides, so the floating sum order is identical too).
 */
final case class HashEmbedder(dim: Int = 16, seed: Long = 42L, portable: Boolean = false)
    extends Embedder {

  private def compSql(v: String, i: String): String =
    if (portable)
      s"(cast(((${seed}L + $v * 73856093L + $i * 83492791L) % 1000000007L " +
        s"* 1103515245L + 12345L) % 1000000007L % 2000001L as double) / 1000000.0 - 1.0)"
    else
      s"(cast(pmod(xxhash64(${seed}L, $v, $i), 2000001) as double) / 1000000.0 - 1.0)"

  /** Token values of `docCol`: array<bigint>, order-preserving. */
  private def tokenValuesSql(docCol: String): String =
    s"""transform(
       |  filter(split(lower($docCol), '[^a-z0-9]+'), t -> length(t) > 0),
       |  t -> aggregate(sequence(1, length(t)), cast(7 as bigint),
       |         (acc, i) -> (acc * 31 + ascii(substring(t, i, 1))) % 1000000007L))""".stripMargin

  def embed(docCol: String): Column =
    // the token-value array is the single child of the native projection
    // kernel, so tokenization+hashing run once per document and the
    // dim × tokens accumulation is one fused generated loop
    // (bit-identical to [[embedSql]] — same index-order double folds;
    // asserted in HashExpressionsSpec; the DuckDB replay is unaffected)
    graft.functions.HashExpressions.hashEmbed(
      expr(tokenValuesSql(docCol)), dim, seed, portable)

  /** The composed-builtins form [[embed]] replaced — executable spec for
    * the kernel's bit-identity test. */
  private[graft] def embedSql(docCol: String): Column =
    expr(
      s"""element_at(transform(array(${tokenValuesSql(docCol)}), tv ->
         |  transform(sequence(0, ${dim - 1}), i ->
         |    aggregate(tv, cast(0.0 as double),
         |      (acc, v) -> acc + ${compSql("v", "i")}))), 1)""".stripMargin)

  /** DuckDB SQL fragment computing the identical embedding of a text
    * expression — only meaningful when `portable = true`; exposed so oracle
    * queries can inline the exact replay. */
  def duckDbSql(docSql: String): String = {
    require(portable, "only the portable LCG mode is DuckDB-replayable")
    s"""list_transform(range(0, $dim), i ->
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(
       |    list_transform(
       |      list_filter(regexp_split_to_array(lower($docSql), '[^a-z0-9]+'), t -> len(t) > 0),
       |      t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       |             list_transform(range(1, length(t) + 1),
       |               i2 -> CAST(ascii(substr(t, i2, 1)) AS BIGINT))),
       |           (acc, c) -> (acc * 31 + c) % 1000000007)),
       |    v -> CAST(($seed + v * 73856093 + i * 83492791) % 1000000007
       |              * 1103515245 + 12345 AS BIGINT) % 1000000007 % 2000001
       |         / 1000000.0 - 1.0)),
       |  (acc, x) -> acc + x))""".stripMargin
  }
}
