package graft.algos

import graft.bsp.SuperstepRunner
import graft.bsp.SuperstepRunner.{RunConfig, Step}
import graft.graph.TemporalGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Path / reachability algorithms as frontier-join iterations.
 */
object Paths {

  /**
   * Unweighted single-source shortest paths (BFS levels) with cutoff —
   * reference `single_source_shortest_path`
   * (raphtory/src/algorithms/pathing/single_source_shortest_path.rs:62),
   * which walks out-edges breadth-first and records first-visit paths.
   *
   * @return (id, dist, path) — `path` is one first-visit path as an array of
   *         node ids (lexicographically-smallest parent wins ties, making
   *         the result deterministic where the reference's is
   *         iteration-order dependent).
   */
  def sssp(spark: SparkSession, g: TemporalGraph, source: Long, cutoff: Int): DataFrame = {
    val edges = g.simpleEdges.persist()
    val init = spark
      .range(1)
      .select(lit(source).as("id"), lit(0).as("dist"), array(lit(source)).as("path"))

    var prevCount = 1L
    val result = SuperstepRunner.run(
      spark,
      init,
      RunConfig(maxSteps = cutoff, runId = "sssp")) { (state, step) =>
      val frontier = state.filter(col("dist") === step - 1)
      val expanded = frontier
        .join(edges, frontier("id") === edges("src"))
        .select(col("dst").as("id"), lit(step).as("dist"), concat(col("path"), array(col("dst"))).as("path"))
      // keep first (smallest-dist) visit; deterministic tie-break on path
      val newNodes = expanded
        .join(state.select(col("id")), Seq("id"), "left_anti")
        .groupBy("id")
        .agg(min("dist").as("dist"), min("path").as("path"))
      val next = state.unionByName(newNodes)
      Step(
        next,
        { m =>
          val c = m.count()
          val done = c == prevCount
          prevCount = c
          (done, Map("visited" -> c.toDouble))
        })
    }
    edges.unpersist(false)
    result.state.select("id", "dist", "path")
  }

  /**
   * Weighted single-source shortest paths, Bellman–Ford style (the bulk
   * counterpart of the reference's sequential Dijkstra,
   * algorithms/pathing/dijkstra.rs:97): dist'(v) = min(dist(v),
   * min over in-edges (dist(u) + w(u,v))), iterated to fixpoint or cap.
   * Edge weight column `weightCol` must exist on the edge-events table;
   * multi-edges use the minimum weight per (src, dst).
   */
  def weightedSssp(
      spark: SparkSession,
      g: TemporalGraph,
      source: Long,
      weightCol: String,
      maxIter: Int = 50): DataFrame = {
    val w = g.edges
      .select(col("src"), col("dst"), col(weightCol).cast("double").as("w"))
      .groupBy("src", "dst")
      .agg(min("w").as("w"))
      .persist()
    val init = g.nodes.select(
      col("id"),
      when(col("id") === source, lit(0.0)).otherwise(lit(Double.PositiveInfinity)).as("dist"))

    val result = SuperstepRunner.run(
      spark,
      init,
      RunConfig(maxSteps = maxIter, runId = "dijkstra")) { (state, _) =>
      val relax = w
        .join(state.select(col("id"), col("dist")), w("src") === col("id"))
        .filter(!col("dist").isNaN && col("dist") =!= Double.PositiveInfinity)
        .groupBy(w("dst").as("id"))
        .agg(min(col("dist") + col("w")).as("relaxed"))
      val next = state
        .join(relax, Seq("id"), "left")
        .select(
          col("id"),
          least(col("dist"), coalesce(col("relaxed"), col("dist"))).as("dist"),
          (least(col("dist"), coalesce(col("relaxed"), col("dist"))) < col("dist")).as("changed"))
      Step(
        next.select("id", "dist", "changed"),
        { m =>
          val c = m.filter(col("changed")).count()
          (c == 0, Map("relaxed" -> c.toDouble))
        })
    }
    w.unpersist(false)
    result.state.filter(col("dist") =!= Double.PositiveInfinity).select("id", "dist")
  }

  /**
   * Temporally-respecting reachability from seed nodes: taint spreads along
   * an edge event (u→v, t) iff u is tainted with taint time ≤ t; v's taint
   * time becomes the earliest such event time (reference
   * algorithms/pathing/temporal_reachability.rs:78, earliest-taint BFS).
   *
   * @param seeds (node id, start time millis)
   * @return (id, taint_ts) — earliest time each reachable node is tainted.
   */
  def temporalReachability(
      spark: SparkSession,
      g: TemporalGraph,
      seeds: Seq[(Long, Long)],
      maxIter: Int = 100): DataFrame = {
    import spark.implicits._
    val events = g.edges.select(col("src"), col("dst"), col("ts")).persist()
    val init = seeds.toDF("id", "taint_ts")

    val result = SuperstepRunner.run(
      spark,
      init,
      RunConfig(maxSteps = maxIter, runId = "temporal-reach")) { (state, _) =>
      val spread = events
        .join(state, events("src") === state("id") && events("ts") >= state("taint_ts"))
        .groupBy(events("dst").as("id"))
        .agg(min(events("ts")).as("spread_ts"))
      val merged = state
        .join(spread, Seq("id"), "full")
        .select(
          col("id"),
          least(coalesce(col("taint_ts"), col("spread_ts")), coalesce(col("spread_ts"), col("taint_ts")))
            .as("taint_ts"),
          (col("taint_ts").isNull ||
            (col("spread_ts").isNotNull && col("spread_ts") < col("taint_ts"))).as("changed"))
      Step(
        merged.select("id", "taint_ts", "changed"),
        { m =>
          val c = m.filter(col("changed")).count()
          (c == 0, Map("changed" -> c.toDouble))
        })
    }
    events.unpersist(false)
    result.state.select("id", "taint_ts")
  }
}
