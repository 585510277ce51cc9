package graft.algos

import graft.bsp.SuperstepRunner
import graft.bsp.SuperstepRunner.{RunConfig, Step}
import graft.graph.TemporalGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iterative k-core peeling on distinct-BOTH-neighbour degree, matching the
 * reference (raphtory/src/algorithms/cores/k_core.rs:41-95): a node is in
 * the k-core iff at least k of its distinct undirected neighbours are in
 * the k-core; initial set = nodes with degree ≥ k; peel until fixpoint.
 *
 * State per superstep is the alive-node set; each round is one
 * semi-join + groupBy over the (persisted) neighbour-pair table.
 */
object KCore {

  final case class Config(
      k: Int,
      maxIter: Int = 1000,
      checkpointDir: Option[String] = None,
      checkpointEvery: Int = 10)

  /** Node ids in the k-core: one `id` column. */
  def coreSet(spark: SparkSession, g: TemporalGraph, cfg: Config): DataFrame = {
    val pairs = g.undirectedPairs.persist()

    val init = pairs
      .groupBy(col("node").as("id"))
      .agg(count(lit(1)).as("d"))
      .filter(col("d") >= cfg.k)
      .select("id")

    var prevCount = -1L
    val result = SuperstepRunner.run(
      spark,
      init,
      RunConfig(cfg.maxIter, cfg.checkpointDir, cfg.checkpointEvery, runId = s"kcore-${cfg.k}")) {
      (alive, _) =>
        // alive neighbours count, restricted to currently-alive centers
        val next = pairs
          .join(alive.select(col("id").as("node")), Seq("node"), "left_semi")
          .join(alive.select(col("id").as("nbr")), Seq("nbr"), "left_semi")
          .groupBy(col("node").as("id"))
          .agg(count(lit(1)).as("alive_nbrs"))
          .filter(col("alive_nbrs") >= cfg.k)
          .select("id")
        Step(
          next,
          { m =>
            val c = m.count()
            val done = c == prevCount || c == 0
            prevCount = c
            (done, Map("alive" -> c.toDouble))
          })
    }
    pairs.unpersist(false)
    result.state.select("id")
  }

  /** k-core as an induced subgraph view (reference k_core, :95). */
  def coreSubgraph(spark: SparkSession, g: TemporalGraph, cfg: Config): TemporalGraph =
    g.subgraph(coreSet(spark, g, cfg))
}
