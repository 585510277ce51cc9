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
 * Per superstep ONE fused message pass joins a PERSISTED, hub-salted
 * SIGNED both-direction CSR ([[TemporalGraph.adjacencySigned]]: entries
 * carry (nbr, out)) against the state and explodes once — an out entry
 * ships the sender's hub (recv_hub at the neighbour), an in entry ships
 * the sender's auth (recv_auth at the neighbour) — so the superstep pays
 * ONE state exchange + ONE groupBy exchange where the r3 two-pass shape
 * (out-CSR hub pass + in-CSR auth pass) paid two of each. The static
 * adjacency stays hash-partitioned on its join key across supersteps, so
 * only the narrow state frame is ever re-exchanged. Diffs + normalization
 * totals are folded into in-plan aggregates.
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
    val adj = g.adjacencySigned(cfg.maxShard).persist()
    val init = g.nodes.select(col("id"), lit(1.0).as("hub"), lit(1.0).as("auth"))

    val result = SuperstepRunner.run(
      spark,
      init,
      RunConfig(cfg.maxIter, cfg.checkpointDir, cfg.checkpointEvery, runId = "hits")) {
      (state, _) =>
        // fused pass: for edge u→v the (v, out=1) entry on u ships hub(u)
        // to v (recv_hub), the (u, out=0) entry on v ships auth(v) to u
        // (recv_auth) — one explode, map-side partial agg, ONE exchange
        val recv = adj
          .join(state.select(col("id"), col("hub"), col("auth")), adj("node") === col("id"))
          .select(explode(col("nbrs")).as("m"), col("hub"), col("auth"))
          .select(
            col("m.nbr").as("id"),
            when(col("m.out") === 1, col("hub")).as("hub_msg"),
            when(col("m.out") === 0, col("auth")).as("auth_msg"))
          .groupBy("id")
          .agg(sum("hub_msg").as("recv_hub"), sum("auth_msg").as("recv_auth"))

        val received = state
          .select(col("id"), col("hub").as("prev_hub"), col("auth").as("prev_auth"))
          .join(recv, Seq("id"), "left")
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
    adj.unpersist(false)
    (
      result.state.select(col("id"), col("hub").as("hub_score"), col("auth").as("auth_score")),
      result.metrics)
  }
}
