package graft.tools

import org.apache.spark.sql.SparkSession
import graft.data.TranscriptGen
import graft.graph.{EdgeBuilder, TemporalGraph}
import graft.algos._

/** Scratch timing harness (not part of the public surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val n = args.headOption.map(_.toLong).getOrElse(200L)
    val transcripts = time("gen")(TranscriptGen.transcripts(spark, n).persist())
    time("gen count")(println("turns=" + transcripts.count()))
    val edges = time("edges")(EdgeBuilder.edges(transcripts).persist())
    time("edges count")(println("edges=" + edges.count()))
    val g = TemporalGraph(edges)
    val (pr, steps) = time("pagerank")(PageRank.runWithStats(spark, g, PageRank.Config(maxIter = 20, tol = 1e-6)))
    println("pr steps=" + steps + " rows=" + pr.count())
    time("wcc")(println("wcc rows=" + ConnectedComponents.run(spark, g).count()))
    time("lpa")(println("lpa rows=" + LabelPropagation.run(spark, g, LabelPropagation.Config(maxIter = 5)).count()))
    time("tri")(println("tri=" + Triangles.globalCount(spark, g)))
    spark.stop()
  }
}
