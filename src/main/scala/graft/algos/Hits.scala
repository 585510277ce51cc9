package graft.algos

import graft.bsp.SuperstepRunner
import graft.bsp.SuperstepRunner.{RunConfig, Step}
import graft.graph.TemporalGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * HITS (hubs & authorities) with the reference's semantics
 * (raphtory/src/algorithms/centrality/hits.rs:53-158):
 *
 *  - init hub = auth = 1;
 *  - per superstep: recv_hub(v) = Σ hub(u) over u → v (distinct
 *    in-neighbours); recv_auth(v) = Σ auth(w) over v → w *received from* the
 *    out side (i.e. along reversed edges);
 *  - normalize by the global totals of the received sums:
 *    auth' = recv_hub / Σ recv_hub, hub' = recv_auth / Σ recv_auth;
 *  - stop when max |Δhub| ≤ 0.01 and max |Δauth| ≤ 0.01, or iteration cap.
 *
 * Per superstep the two message passes each join a PERSISTED, hub-salted
 * CSR adjacency (out-CSR for the hub pass, in-CSR for the auth pass —
 * [[TemporalGraph.adjacencyOut]]/[[TemporalGraph.adjacencyIn]]) against the
 * state and explode: the big, static adjacency side stays hash-partitioned
 * on its join key across supersteps so only the narrow state frame is ever
 * re-exchanged (joining the raw edge pair table instead re-shuffles the
 * whole edge set twice per superstep — the dominant steady-state cost).
 * Diffs + normalization totals are folded into in-plan aggregates.
 */
object Hits {

  final case class Config(
      maxIter: Int = 20,
      tol: Double = 0.01,
      checkpointDir: Option[String] = None,
      checkpointEvery: Int = 10,
      maxShard: Int = graft.graph.TemporalGraph.DefaultMaxShard)

  /** @return (id, hub_score, auth_score). */
  def run(spark: SparkSession, g: TemporalGraph, cfg: Config = Config()): DataFrame =
    runWithMetrics(spark, g, cfg)._1

  /** As [[run]], also returning per-superstep metrics (incl. `wallMs`). */
  def runWithMetrics(
      spark: SparkSession,
      g: TemporalGraph,
      cfg: Config = Config()): (DataFrame, List[Map[String, Double]]) = {
    val adjOut = g.adjacencyOut(cfg.maxShard).persist()
    val adjIn = g.adjacencyIn(cfg.maxShard).persist()
    val init = g.nodes.select(col("id"), lit(1.0).as("hub"), lit(1.0).as("auth"))

    val result = SuperstepRunner.run(
      spark,
      init,
      RunConfig(cfg.maxIter, cfg.checkpointDir, cfg.checkpointEvery, runId = "hits")) {
      (state, _) =>
        // hub mass flows src → dst: fan out each source's hub along its
        // out-CSR shard rows (bounded by maxShard) and partially aggregate
        // map-side before the groupBy(dst) exchange
        val recvHub = adjOut
          .join(state.select(col("id"), col("hub")), adjOut("src") === col("id"))
          .select(explode(col("dsts")).as("id"), col("hub"))
          .groupBy("id")
          .agg(sum("hub").as("recv_hub"))
        // auth mass flows dst → src along the in-CSR
        val recvAuth = adjIn
          .join(state.select(col("id"), col("auth")), adjIn("dst") === col("id"))
          .select(explode(col("srcs")).as("id"), col("auth"))
          .groupBy("id")
          .agg(sum("auth").as("recv_auth"))

        val received = state
          .select(col("id"), col("hub").as("prev_hub"), col("auth").as("prev_auth"))
          .join(recvHub, Seq("id"), "left")
          .join(recvAuth, Seq("id"), "left")
          .select(
            col("id"),
            col("prev_hub"),
            col("prev_auth"),
            coalesce(col("recv_hub"), lit(0.0)).as("recv_hub"),
            coalesce(col("recv_auth"), lit(0.0)).as("recv_auth"))

        // Totals over the received sums (reference step3) as a broadcast
        // one-row aggregate INSIDE the same plan — a driver-side .first()
        // here would execute the two message joins once for the totals and
        // again when the runner materializes `next` (2× cost per superstep).
        val totals = broadcast(
          received.agg(
            coalesce(sum("recv_hub"), lit(0.0)).as("total_hub"),
            coalesce(sum("recv_auth"), lit(0.0)).as("total_auth")))

        val normHub =
          col("recv_auth") / when(col("total_auth") === 0.0, 1.0).otherwise(col("total_auth"))
        val normAuth =
          col("recv_hub") / when(col("total_hub") === 0.0, 1.0).otherwise(col("total_hub"))
        val next = received
          .crossJoin(totals)
          .select(
            col("id"),
            normHub.as("hub"),
            normAuth.as("auth"),
            abs(normHub - col("prev_hub")).as("dh"),
            abs(normAuth - col("prev_auth")).as("da"))

        Step(
          next,
          { m =>
            if (cfg.tol <= 0.0) (false, Map.empty) // forced-iteration mode
            else {
            val r = m.agg(max("dh"), max("da")).first()
            val mh = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
            val ma = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
            (mh <= cfg.tol && ma <= cfg.tol, Map("max_dh" -> mh, "max_da" -> ma))
            }
          })
    }
    adjOut.unpersist(false)
    adjIn.unpersist(false)
    (
      result.state.select(col("id"), col("hub").as("hub_score"), col("auth").as("auth_score")),
      result.metrics)
  }
}
