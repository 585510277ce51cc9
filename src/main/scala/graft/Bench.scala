package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.TranscriptGen
import graft.graph.{EdgeBuilder, TemporalGraph}
import graft.algos.{ConnectedComponents, LabelPropagation, PageRank, Triangles}

/**
 * Headline benchmark: synthesize the transcript link graph at a size scaled
 * to the requested SF, then time edge-build + the four flagship algorithms.
 * Prints exactly ONE JSON line (driver contract).
 *
 * Env:
 *  - SPARK_GRAFT_SF_DIR: testdata dir; its sf suffix picks the graph size
 *  - SPARK_GRAFT_CPUS:   local[N] parallelism (default 32)
 */
object Bench {

  def numConvsFor(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 20000L
    else if (sfDir.contains("sf0.01")) 2000L
    else 200L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    var extras = scala.collection.mutable.LinkedHashMap[String, Double]()

    // --- edge build over synthesized transcripts ---
    val nConvs = numConvsFor(sfDir)
    val transcripts = TranscriptGen.transcripts(spark, nConvs).persist()
    transcripts.count()
    val (edges, tBuild) = time {
      val e = EdgeBuilder.edges(transcripts).persist()
      e.count()
      e
    }
    results += "edge_build" -> tBuild
    val g = TemporalGraph(edges)
    val nEdges = g.simpleEdges.count()
    extras += "n_edges" -> nEdges.toDouble

    // --- PageRank to 1e-6 ---
    val (prSteps, tPr) = time {
      val (ranks, steps) = PageRank.runWithStats(spark, g, PageRank.Config(maxIter = 60, tol = 1e-6))
      ranks.count()
      steps
    }
    results += "pagerank" -> tPr
    extras += "pagerank_supersteps" -> prSteps.toDouble
    extras += "pagerank_supersteps_per_sec" -> prSteps / tPr
    extras += "pagerank_edges_traversed_per_sec" -> prSteps.toDouble * nEdges / tPr

    // --- WCC ---
    val (_, tWcc) = time(ConnectedComponents.run(spark, g).count())
    results += "wcc" -> tWcc

    // --- LPA (capped) ---
    val (_, tLpa) = time(LabelPropagation.run(spark, g, LabelPropagation.Config(maxIter = 10)).count())
    results += "lpa" -> tLpa

    // --- triangles ---
    val (_, tTri) = time(Triangles.globalCount(spark, g))
    results += "triangles" -> tTri

    // --- one relational headline on the provided testdata ---
    val (_, tRel) = time(SparkEntry.queries("q_agg_groupby")(spark, sfDir).count())
    results += "q_agg_groupby" -> tRel

    val qs = (results ++ extras).map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
