package graft.algos

import graft.bsp.SuperstepRunner
import graft.bsp.SuperstepRunner.{RunConfig, Step}
import graft.graph.TemporalGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * k-truss decomposition (Cohen 2008) — the triangle-based cohesion
 * subgraph that complements [[KCore]]: the k-truss is the maximal subgraph
 * in which every edge participates in at least k−2 triangles. Computed by
 * the standard peel loop: count per-edge triangle support within the
 * CURRENT edge set, drop edges below k−2, repeat to fixpoint (a removed
 * edge can break its neighbours' triangles, so support is recounted each
 * round).
 *
 * Per round (under [[SuperstepRunner]], state = surviving canonical
 * edges): rebuild sorted neighbour arrays from the surviving set (one
 * groupBy on the node key), join each edge against both endpoint arrays,
 * support = `size(array_intersect)` — the same fused-array intersection
 * as [[Triangles]]/[[graft.ml.GraphLearn.linkFeatures]]; the two array
 * joins share one exchange subtree via ReuseExchange. No wedge explode:
 * a hub's array is one row bounded by its degree (the linkFeatures
 * caveat: a degree-10⁸ hub makes a wide row — k-truss peeling on such
 * graphs usually runs AFTER a k-core cut, which [[KCore]] provides).
 *
 * A converged truss is a fixpoint of recount+filter, so the DuckDB oracle
 * replays a PINNED number of rounds ≥ the Spark run's convergence round
 * (extra SQL rounds are no-ops — the k-core oracle precedent).
 *
 * @return (a, b, support): the canonical k-truss edges with their final
 *         within-truss triangle support
 */
object Truss {

  def run(
      spark: SparkSession,
      g: TemporalGraph,
      k: Int,
      maxRounds: Int = 64): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    val init = g.canonicalUndirected // (a, b), a < b, no self-loops

    def supported(state: DataFrame): DataFrame = {
      val und = state.select(col("a").as("node"), col("b").as("nbr"))
        .union(state.select(col("b").as("node"), col("a").as("nbr")))
      val narr = und.groupBy("node").agg(sort_array(collect_list("nbr")).as("ns"))
      state
        .join(narr.as("__ta"), col("a") === col("__ta.node"))
        .join(narr.as("__tb"), col("b") === col("__tb.node"))
        .select(
          col("a"), col("b"),
          size(array_intersect(col("__ta.ns"), col("__tb.ns"))).cast("long").as("support"))
    }

    val res = SuperstepRunner.run(
      spark, init, RunConfig(maxSteps = maxRounds, runId = s"truss-$k")) { (state, _) =>
      val prev = state.count()
      val next = supported(state).filter(col("support") >= (k - 2).toLong).select("a", "b")
      Step(
        next,
        st => {
          val c = st.count()
          (c == prev, Map("edges" -> c.toDouble))
        })
    }
    supported(res.state)
  }
}
