package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/**
 * Dump `explain("formatted")` plans for the declared queries touched by the
 * r6 optimization round, into `<outDir>` — one file per query. For the
 * iterative algorithms the meaningful shape is ONE superstep's plan, which
 * the GRAFT_EXPLAIN_DIR hook in [[graft.bsp.SuperstepRunner]] (and the
 * GraphLearn walk loop) emits as `<runId>_superstep.txt` while the query
 * runs; for plain relational queries this dumps the query's own plan.
 *
 * Usage: GRAFT_EXPLAIN_DIR=<outDir> sbt "runMain graft.tools.PlanDump <outDir> [sfDir]"
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/plans"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    // Relational queries: the result plan IS the query plan.
    val relational = Seq(
      "q_text_perplexity_buckets",
      "q_graph_null_permuted",
      "q_dedup_semantic",
      "q_graph_link_features",
      "q_graph_neighbor_sample")
    relational.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"$name.txt"), text.getBytes(StandardCharsets.UTF_8))
      println(s"dumped $name")
    }

    // Iterative queries: RUN them (small SF) with GRAFT_EXPLAIN_DIR set so
    // the superstep hook writes <runId>_superstep.txt per algorithm.
    val iterative = Seq(
      "q_graph_eigenvector",
      "q_graph_hits",
      "q_graph_wcc",
      "q_graph_louvain",
      "q_graph_coreness",
      "q_graph_mis",
      "q_graph_random_walks",
      "q_graph_node2vec_walks",
      "q_graph_temporal_walks",
      "q_graph_harmonic",
      "q_graph_ktruss",
      "q_graph_pagerank")
    iterative.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(s"ran $name (superstep plans in GRAFT_EXPLAIN_DIR)")
    }
    spark.stop()
  }
}
