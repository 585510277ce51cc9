package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.TranscriptGen
import graft.graph.{EdgeBuilder, TemporalGraph}
import graft.algos.{Centrality, PageRank}

/** Diagnose the sf1 eigenvector anomaly (BENCH.md round-5 sf1 pass):
  * per-superstep eigenvector vs PageRank walls on the same CSR at a given
  * conv count, with AQE on and off. Usage: EigProfile [nConvs] [steps]. */
object EigProfile {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toLong else 200000L
    val steps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = TranscriptGen.transcripts(spark, nConvs).persist()
    t.count()
    val edges = EdgeBuilder.edges(t).persist()
    println(s"[eig] convs=$nConvs edges=${edges.count()}")
    val g = TemporalGraph(edges)

    def time[A](tag: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[eig] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    def cacheStats(tag: String): Unit = {
      val rdds = spark.sparkContext.getPersistentRDDs
      val mem = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1e9
      println(f"[eig] cache@$tag%-22s n=${rdds.size}%3d mem=${mem}%6.2f GB")
    }

    // warm (JIT + adjacency build)
    PageRank.run(spark, g, PageRank.Config(maxIter = 2, tol = 0.0)).count()

    cacheStats("start")
    time(s"pagerank x$steps")(
      PageRank.run(spark, g, PageRank.Config(maxIter = steps, tol = 0.0)).count())
    cacheStats("post-pagerank")
    time(s"eigenvector x$steps (AQE on)")(
      Centrality.eigenvector(spark, g, Centrality.Config(maxIter = steps, tol = 0.0)).count())
    cacheStats("post-eigen-1")
    // the exact Bench leg shape (CSR build + 10 supersteps), twice
    time("eigenvector x10 (bench leg, rep1)")(
      Centrality.eigenvector(spark, g, Centrality.Config(maxIter = 10, tol = 0.0)).count())
    time("eigenvector x10 (bench leg, rep2)")(
      Centrality.eigenvector(spark, g, Centrality.Config(maxIter = 10, tol = 0.0)).count())

    // replicate the bench's sf1 ordering: the RA-graph walk + HyperBall
    // legs run immediately before eigenvector — check for cache growth
    if (sys.env.getOrElse("SPARK_GRAFT_EIG_SEQ", "1") == "1") {
      val ra = graft.data.GraphGen.randomAttachment(spark, 1000000L, 4)
      time("ra walks")(
        graft.ml.GraphLearn.randomWalks(spark, ra, length = 8, nWalks = 1).count())
      cacheStats("post-walks")
      time("ra node2vec")(
        graft.ml.GraphLearn.node2vecWalks(
          spark, ra, length = 8, nWalks = 1, wReturn = 2, wInner = 1, wOuter = 4).count())
      cacheStats("post-node2vec")
      time("ra harmonic x8")(
        graft.algos.Reach.harmonicCloseness(spark, ra, iters = 8).count())
      cacheStats("post-harmonic")
      time(s"eigenvector x$steps (post-seq)")(
        Centrality.eigenvector(spark, g, Centrality.Config(maxIter = steps, tol = 0.0)).count())
      cacheStats("post-eigen-2")
    }
    spark.stop()
  }
}
