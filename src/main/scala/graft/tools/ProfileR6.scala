package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.{GraphGen, TranscriptGen}
import graft.graph.{EdgeBuilder, TemporalGraph}

/**
 * Round-6 optimization profiler (guide §1: measure first). Reproduces the
 * heavy bench legs with PHASE isolation (CSR build vs superstep loop vs
 * assembly) and per-phase stage/task/task-seconds deltas from the
 * StageMetricsListener, so each wall second is attributable to a plan
 * phase before anything is changed. Does NOT touch Bench.scala (frozen).
 *
 * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
 *        sbt "runMain graft.tools.ProfileR6 wcc louvain ..."
 * With no args, profiles the default hot set.
 */
object ProfileR6 {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new graft.bench.Calibration.StageMetricsListener
    spark.sparkContext.addSparkListener(listener)

    def phase[A](name: String)(f: => A): A = {
      val s0 = listener.snapshot()
      val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(name)
      val a = f
      val wall = (System.nanoTime() - t0) / 1e9
      val d = listener.delta(s0)
      val jobs1 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      println(f"PHASE $name%-40s wall=$wall%8.3f task_sec=${d("runTimeMs") / 1000.0}%9.2f " +
        f"stages=${d("stages").toLong}%4d tasks=${d("tasks").toLong}%6d " +
        f"jobs=${jobs1 - jobs0}%4d shufGB=${(d("shuffleReadB") + d("shuffleWriteB")) / 1e9}%7.3f")
      a
    }

    val sel: Set[String] =
      if (args.isEmpty)
        Set("wcc", "louvain", "eig", "wpr", "walks", "n2v", "twalks", "harmonic",
          "mis", "truss", "nsample", "pplb", "semded", "kmeans", "pr")
      else args.toSet

    // --- shared inputs, exactly the bench's ---
    val nConvs = graft.Bench.numConvsFor(sfDir)
    val transcripts = TranscriptGen.transcripts(spark, nConvs).persist()
    transcripts.count()
    val edges = phase("edge_build")(
      { val e = EdgeBuilder.edges(transcripts).persist(); e.count(); e })
    val g = TemporalGraph(edges)
    val nEdges = phase("n_edges(simpleEdges.count)")(g.simpleEdges.count())
    println(s"n_edges=$nEdges")
    val ra = GraphGen.randomAttachment(spark, graft.Bench.triNodesFor(sfDir), 4)
    phase("ra_materialize")(ra.edges.count())

    // warm-up, same as bench
    phase("warmup_pagerank2")(
      graft.algos.PageRank.run(spark, g, graft.algos.PageRank.Config(maxIter = 2, tol = 0.0)).count())

    if (sel("pr")) {
      val adjB = phase("pr_csr_build") {
        val a = g.adjacencyOut(TemporalGraph.DefaultMaxShard).persist(); a.count(); a
      }
      phase("pr_fixed20_loop") {
        graft.algos.PageRank.runFull(spark, adjB, g.nodes,
          graft.algos.PageRank.Config(maxIter = 20, tol = 0.0)).state.count()
      }
      adjB.unpersist(false)
    }

    if (sel("wcc")) phase("wcc_total") {
      val (df, m) = graft.algos.ConnectedComponents.runWithMetrics(spark, g)
      df.count()
      println("  wcc superstep walls: " +
        m.flatMap(_.get("wallMs")).map(w => f"${w / 1000}%.2f").mkString(" "))
    }

    if (sel("lpa")) phase("lpa_total") {
      val (df, m) = graft.algos.LabelPropagation.runWithMetrics(
        spark, g, graft.algos.LabelPropagation.Config(maxIter = 10))
      df.count()
      println("  lpa superstep walls: " +
        m.flatMap(_.get("wallMs")).map(w => f"${w / 1000}%.2f").mkString(" "))
    }

    if (sel("hits")) phase("hits_total") {
      val (df, m) = graft.algos.Hits.runWithMetrics(
        spark, g, graft.algos.Hits.Config(maxIter = 10, tol = 0.0))
      df.count()
      println("  hits superstep walls: " +
        m.flatMap(_.get("wallMs")).map(w => f"${w / 1000}%.2f").mkString(" "))
    }

    if (sel("eig")) {
      val adjB = phase("eig_csr_build") {
        val a = g.adjacencyOut(TemporalGraph.DefaultMaxShard).persist(); a.count(); a
      }
      phase("eig_loop10") {
        graft.algos.Centrality.eigenvectorOnAdjacency(spark, adjB, g.nodes,
          graft.algos.Centrality.Config(maxIter = 10, tol = 0.0)).count()
      }
      adjB.unpersist(false)
    }

    if (sel("wpr")) {
      val weights = phase("wpr_weights_agg") {
        val w = g.edges.groupBy("src", "dst").agg(count(lit(1)).as("w")).persist()
        w.count(); w
      }
      val adjW = phase("wpr_csr_build") {
        val a = g.adjacencyOutWeighted(weights, TemporalGraph.DefaultMaxShard).persist()
        a.count(); a
      }
      phase("wpr_loop10_via_weighted") {
        // NOTE: PageRank.weighted builds its own CSR; this times the bench call
        graft.algos.PageRank.weighted(spark, g, weights,
          graft.algos.PageRank.Config(maxIter = 10, tol = 0.0)).count()
      }
      adjW.unpersist(false); weights.unpersist(false)
    }

    if (sel("louvain")) phase("louvain_total") {
      val (df, m) = graft.algos.Louvain.runWithMetrics(
        spark, ra, graft.algos.Louvain.Config(maxLevels = 3, maxLocalRounds = 8))
      df.count()
      println("  louvain round walls: " +
        m.map(mm => f"L${mm.getOrElse("level", -1.0).toInt}:${mm.getOrElse("wallMs", 0.0) / 1000}%.2f")
          .mkString(" "))
    }

    if (sel("truss")) phase("truss_bench_shape") {
      val ev = graft.rel.Queries.eventEdges(spark, sfDir)
      val und = graft.graph.TemporalGraph(ev).canonicalUndirected.persist()
      und.count()
      val med = graft.algos.Truss.supported(und)
        .stat.approxQuantile("support", Array(0.5), 0.001).head
      und.unpersist(false)
      val k = math.max(4, med.toLong + 2)
      val s = k + 1
      val nClq = math.max(3L, nEdges / (s * (s - 1)))
      val base = 1L << 40
      val clq = spark.range(nClq)
        .select(col("id").as("c"), explode(sequence(lit(0L), lit(s - 2))).as("i"))
        .select(col("c"), col("i"), explode(sequence(col("i") + 1, lit(s - 1))).as("j"))
        .select(
          (lit(base) + col("c") * s + col("i")).as("src"),
          (lit(base) + col("c") * s + col("j")).as("dst"),
          lit(0L).as("ts"), lit(0L).as("event_id"), lit("_default").as("layer"))
      val gt = graft.graph.TemporalGraph(ev.unionByName(clq))
      val (df, mm) = graft.algos.Truss.runWithMetrics(spark, gt, k = k.toInt)
      df.count()
      println("  truss round walls: " +
        mm.flatMap(_.get("wallMs")).map(w => f"${w / 1000}%.2f").mkString(" "))
    }

    if (sel("walks")) phase("graph_random_walks") {
      val w = graft.ml.GraphLearn.randomWalks(spark, ra, length = 8, nWalks = 1)
      w.count()
    }

    if (sel("n2v")) phase("graph_node2vec_walks") {
      graft.ml.GraphLearn.node2vecWalks(
        spark, ra, length = 8, nWalks = 1, wReturn = 2, wInner = 1, wOuter = 4).count()
    }

    if (sel("twalks")) phase("graph_temporal_walks") {
      graft.ml.GraphLearn.temporalWalks(spark, ra, length = 8, nWalks = 1).count()
    }

    if (sel("nsample")) phase("graph_neighbor_sample") {
      val seeds = ra.nodes.select(col("id").as("seed"))
        .filter(graft.ml.GraphLearn.hmix(
          42L, (col("id"), graft.ml.GraphLearn.M1)) % 1000000L < 200000L)
      graft.ml.GraphLearn.neighborSample(spark, ra, seeds, Seq(10, 5)).count()
    }

    if (sel("harmonic")) phase("graph_harmonic") {
      graft.algos.Reach.harmonicCloseness(spark, ra, iters = 8).count()
    }

    if (sel("mis")) phase("graph_mis") {
      graft.algos.Independent.maximalIndependentSet(spark, ra).count()
    }

    // --- LLM-pipeline small legs with big wall/task gaps ---
    if (sel("pplb") || sel("semded") || sel("kmeans")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").persist()
      docs.count()
      if (sel("pplb")) phase("text_perplexity_buckets") {
        val ppl = graft.ml.TextAnalysis.lmQuality(docs)
          .select(col("doc_id"), col("perplexity"))
        graft.ml.CorpusOps.quantileBuckets(ppl, "perplexity", nBuckets = 3).count()
      }
      docs.unpersist(false)
      val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").persist()
      vecs.count()
      if (sel("semded")) phase("dedup_semantic") {
        graft.ml.SemDedup.semDedup(vecs, threshold = 0.35, nCells = 16).count()
      }
      if (sel("kmeans")) phase("embed_kmeans") {
        val r = graft.ml.Clustering.kmeans(vecs, k = 16, assignRounds = 3)
        r.assignment.count()
      }
      vecs.unpersist(false)
    }

    spark.stop()
  }
}
