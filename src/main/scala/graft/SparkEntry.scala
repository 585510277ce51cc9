package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.TranscriptGen
import graft.graph.TemporalGraph
import graft.algos.PageRank

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: synthesize a small deterministic transcript table →
    * build the two-layer link graph → PageRank to 1e-6 → top-10 turns by
    * score joined back to their text. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val transcripts = TranscriptGen.transcripts(spark, numConvs = 200, longConvEvery = 50, longConvTurns = 300)
    val g = TemporalGraph.fromTranscripts(transcripts)
    val ranks = PageRank.run(spark, g, PageRank.Config(maxIter = 50, tol = 1e-6))
    val nodes = graft.graph.EdgeBuilder.nodes(transcripts)
    ranks
      .join(nodes, Seq("id"))
      .orderBy(col("score").desc, col("id"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("score"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = rel.Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = rel.Queries.oracles
}
