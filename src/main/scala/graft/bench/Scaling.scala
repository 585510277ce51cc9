package graft.bench

import org.apache.spark.sql.SparkSession

import graft.data.TranscriptGen
import graft.graph.{EdgeBuilder, TemporalGraph}
import graft.algos.PageRank

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * Two-cluster-size scaling evidence (north rule: throughput scaling
 * efficiency ≥ 0.8 from N to 4N executors). No real cluster exists in this
 * sandbox, so the same job runs at `local[8]` and `local[32]` — same input,
 * same plan, 4× the cores — and we report PageRank superstep throughput at
 * both plus efficiency = (T_8 / T_32) / 4.
 *
 * The workload is sized so executor work dominates fixed per-superstep
 * driver overhead (the quantity that would *also* be amortized on a real
 * 1000-executor cluster): default 40k conversations ≈ 1.2M turns/edges,
 * 10 forced PageRank supersteps.
 *
 * Usage: runMain graft.bench.Scaling [numConvs] [supersteps]
 * Appends a markdown row to BENCH.md and prints one JSON line.
 */
object Scaling {

  def main(args: Array[String]): Unit = {
    val numConvs = args.headOption.map(_.toLong).getOrElse(40000L)
    val steps = args.drop(1).headOption.map(_.toInt).getOrElse(10)

    def runAt(cores: Int): (Double, Long) = {
      val spark = SparkSession
        .builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val transcripts = TranscriptGen.transcripts(spark, numConvs).persist()
      transcripts.count()
      val edges = EdgeBuilder.edges(transcripts).persist()
      val g = TemporalGraph(edges)
      val nEdges = g.simpleEdges.count()
      // warm-up pass (JIT + codegen) then the measured run
      PageRank.run(spark, g, PageRank.Config(maxIter = 2, tol = 0.0)).count()
      val t0 = System.nanoTime()
      PageRank.run(spark, g, PageRank.Config(maxIter = steps, tol = 0.0)).count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.stop()
      (secs, nEdges)
    }

    val (t8, nEdges) = runAt(8)
    val (t32, _) = runAt(32)
    val speedup = t8 / t32
    val efficiency = speedup / 4.0
    val thr8 = steps * nEdges / t8
    val thr32 = steps * nEdges / t32

    val json =
      s"""{"metric":"scaling_efficiency","value":$efficiency,"unit":"ratio",""" +
        s""""queries":{"t_local8":$t8,"t_local32":$t32,"speedup":$speedup,""" +
        s""""edges":$nEdges,"supersteps":$steps,""" +
        s""""edges_traversed_per_sec_8":$thr8,"edges_traversed_per_sec_32":$thr32}}"""
    println(json)

    val row =
      s"| ${java.time.Instant.now()} | $numConvs convs / $nEdges edges | $steps supersteps | " +
        f"$t8%.1f s | $t32%.1f s | $speedup%.2fx | $efficiency%.2f | " +
        f"${thr8 / 1e6}%.2fM | ${thr32 / 1e6}%.2fM |\n"
    val bench = Paths.get("BENCH.md")
    if (!Files.exists(bench)) {
      Files.write(
        bench,
        ("# BENCH — measured results\n\n## PageRank scaling (local[8] vs local[32], same input)\n\n" +
          "| when | input | work | T(8) | T(32) | speedup | efficiency | edges/s @8 | edges/s @32 |\n" +
          "|---|---|---|---|---|---|---|---|---|\n").getBytes(StandardCharsets.UTF_8))
    }
    Files.write(bench, row.getBytes(StandardCharsets.UTF_8), StandardOpenOption.APPEND)
  }
}
