package graft.algos

import graft.bsp.SuperstepRunner
import graft.bsp.SuperstepRunner.{RunConfig, Step}
import graft.graph.TemporalGraph
import graft.ml.GraphLearn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Approximate neighbourhood function — HyperBall (Boldi–Vigna 2013), the
 * web-graph algorithm behind effective-diameter / reach analytics at
 * billion-node scale: every node carries a HyperLogLog counter of its
 * out-ball B(v, t) = {w : dist(v → w) ≤ t}; one superstep merges each
 * node's counter with its out-neighbours' counters (set union becomes
 * elementwise register max), so after t steps the counter estimates
 * |B(v, t)| — exact BFS would need Θ(n²) state, the sketch needs
 * m = 16 registers per node.
 *
 * Everything is DETERMINISTIC and integer-exact, so the DuckDB oracle
 * replays it bit-for-bit:
 *  - the node hash is the portable [[GraphLearn.hmix]] family (~30 bits);
 *    register index j = h mod 16, and ρ = 27 − ⌊log₂(h div 16)⌋ via
 *    `length(bin(w))` — a string op both engines share, no float log;
 *  - registers live SPARSELY as (id, j, ρ) rows (absent = 0): state is
 *    ≤ 16·|V| rows, the merge is a plain `groupBy(id, j).max(ρ)` — no
 *    arrays, no collect_list, hub in-degree absorbed by partial
 *    aggregation exactly like the PageRank message sum;
 *  - the HLL denominator Σ 2^{−ρ_j} is computed as the exact INTEGER
 *    Σ 2^{27−ρ_j} (+ 2^27 per zero register), so the estimate is a pure
 *    function of one exact integer — float summation order cannot differ.
 *
 * Per superstep: ONE exchange (the message re-key to src); the edge list
 * joins the register frame on dst. 16 registers (b = 4, α₁₆ = 0.673,
 * Flajolet et al. 2007) keep the sketch ~26% relative error — the
 * HyperBall paper's plumbing at its smallest size; raising m is a
 * constant, not a shape change.
 */
object Reach {

  val M = 16                       // registers (b = 4)
  private val Alpha16 = 0.673      // Flajolet et al. 2007, table for m = 16
  private val Scale = 134217728L   // 2^27: ρ ∈ [1, 27] ⇒ 2^(27−ρ) is integral

  /**
   * Sparse HLL registers of every node's out-ball after `iters` supersteps.
   * @return (id, j 0..15, rho 1..27) — absent (id, j) means register 0
   */
  def registers(
      spark: SparkSession,
      g: TemporalGraph,
      iters: Int,
      seed: Long = 42L): DataFrame = {
    require(iters >= 0 && iters <= 64, s"iters=$iters out of [0, 64]")
    val e = g.simpleEdges
    val init = g.nodes
      .withColumn("__h", GraphLearn.hmix(seed, col("id") -> GraphLearn.M1))
      .withColumn("__w", expr("__h DIV 16"))
      .select(
        col("id"),
        (col("__h") % M).cast("long").as("j"),
        when(col("__w") === 0L, lit(27L))
          .otherwise(lit(27L) - length(bin(col("__w"))).cast("long"))
          .as("rho"))
    if (iters == 0) return init

    SuperstepRunner.run(
      spark, init, RunConfig(maxSteps = iters, runId = s"hyperball-$seed")) {
      (state, _) =>
        val msgs = e
          .join(state, e("dst") === state("id"))
          .select(e("src").as("id"), col("j"), col("rho"))
        val next = state
          .unionByName(msgs)
          .groupBy("id", "j")
          .agg(max("rho").as("rho"))
        Step(next, _ => (false, Map.empty))
    }.state
  }

  /**
   * Per-node ball-size estimate from a [[registers]] frame: the HLL raw
   * estimate α·m²/Σ2^{−ρ_j} with the standard small-range (linear
   * counting) correction m·ln(m/V₀) when raw ≤ 2.5m and V₀ > 0 zero
   * registers remain. Pure per-node function — no cross-node float sums.
   * @return (id, ball_est ROUND 6)
   */
  def estimate(registersDf: DataFrame): DataFrame = {
    val c = Alpha16 * (M.toDouble * M.toDouble) * Scale.toDouble
    registersDf
      .groupBy("id")
      .agg(
        count(lit(1)).as("np"),
        sum(pow(lit(2.0), lit(27L) - col("rho")).cast("long")).as("ps"))
      .select(
        col("id"),
        ((lit(M.toLong) - col("np")) * Scale + col("ps")).as("denom"),
        (lit(M.toLong) - col("np")).as("v0"))
      .select(
        col("id"),
        round(
          when(
            lit(c) / col("denom").cast("double") <= 2.5 * M && col("v0") > 0L,
            lit(M.toDouble) * log(lit(M.toDouble) / col("v0").cast("double")))
            .otherwise(lit(c) / col("denom").cast("double")),
          6).as("ball_est"))
  }
}
