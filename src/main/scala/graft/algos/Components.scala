package graft.algos

import graft.bsp.SuperstepRunner
import graft.bsp.SuperstepRunner.{RunConfig, Step}
import graft.graph.TemporalGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Reachability-based component operators complementing
 * [[ConnectedComponents]] (the WCC): per-seed in/out components and the
 * largest-connected-component view.
 */
object Components {

  /** Nodes reachable FROM the seed along out-edges, with BFS distance —
    * reference out_component (algorithms/components/out_components.rs:165). */
  def outComponent(spark: SparkSession, g: TemporalGraph, seed: Long, maxIter: Int = 100): DataFrame =
    bfs(spark, g.simpleEdges, seed, maxIter)

  /** Nodes that can REACH the seed along out-edges (= BFS on reversed
    * edges) — reference in_component (components/in_components.rs:168). */
  def inComponent(spark: SparkSession, g: TemporalGraph, seed: Long, maxIter: Int = 100): DataFrame =
    bfs(spark, g.simpleEdges.select(col("dst").as("src"), col("src").as("dst")), seed, maxIter)

  private def bfs(spark: SparkSession, edges: DataFrame, seed: Long, maxIter: Int): DataFrame = {
    val e = edges.persist()
    val init = spark.range(1).select(lit(seed).as("id"), lit(0).as("dist"))
    var prevCount = 1L
    val result = SuperstepRunner.run(spark, init, RunConfig(maxSteps = maxIter, runId = "bfs")) {
      (state, step) =>
        val frontier = state.filter(col("dist") === step - 1)
        val nxt = frontier
          .join(e, frontier("id") === e("src"))
          .select(col("dst").as("id"), lit(step).as("dist"))
          .join(state.select("id"), Seq("id"), "left_anti")
          .distinct()
        Step(
          state.unionByName(nxt),
          { m =>
            val c = m.count()
            val done = c == prevCount
            prevCount = c
            (done, Map("visited" -> c.toDouble))
          })
    }
    e.unpersist(false)
    result.state
  }

  /** Largest weakly connected component as an induced subgraph view —
    * reference LargestConnectedComponent (components/lcc.rs:29). */
  def largestConnectedComponent(spark: SparkSession, g: TemporalGraph): TemporalGraph = {
    val labels = ConnectedComponents.run(spark, g).persist()
    val top = labels
      .groupBy("label")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("label"))
      .limit(1)
      .select("label")
    val members = labels.join(top, Seq("label"), "left_semi").select("id")
    val sub = g.subgraph(members)
    labels.unpersist(false)
    sub
  }

  /** Component size histogram `(label, size)` — handy result op over WCC. */
  def componentSizes(spark: SparkSession, g: TemporalGraph): DataFrame =
    ConnectedComponents
      .run(spark, g)
      .groupBy("label")
      .agg(count(lit(1)).as("size"))
}
