package graft.tools

import org.apache.spark.sql.SparkSession
import graft.bench.Calibration
import graft.data.TranscriptGen
import graft.graph.{EdgeBuilder, TemporalGraph}
import graft.algos.PageRank

/** Diagnostic for the scaling gate: one PageRank run at a given core count
  * with togglable skew-join / CSR-salting, per-superstep wall times on
  * stderr (GRAFT_VERBOSE), bracketed by same-moment pure-CPU calibrations,
  * and a stage-metrics attribution of the measured window (GC share, CPU
  * share, shuffle bytes) — the instrumentation that splits "the JVM is
  * collecting" from "the box's memory path is saturated" when a core-count
  * pair misses the ≥0.8 gate. Usage:
  *   SPARK_GRAFT_CPUS=8 PROBE_SKEW=true PROBE_MAXSHARD=131072 \
  *     runMain graft.tools.ScalingProbe [numConvs] [steps]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val skew = sys.env.getOrElse("PROBE_SKEW", "true").toBoolean
    val maxShard = sys.env.getOrElse("PROBE_MAXSHARD", (1 << 17).toString).toInt
    val numConvs = args.headOption.map(_.toLong).getOrElse(600000L)
    val steps = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", skew)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new Calibration.StageMetricsListener
    spark.sparkContext.addSparkListener(listener)

    val (_, _, calPre) = Calibration.cpuRatio(math.max(1, cores / 4), cores)
    println(f"[probe] calib_pre ${cores / 4}->${cores} ratio=$calPre%.2f steal=${Calibration.stealPct()}%.1f%%")

    val transcripts = TranscriptGen.transcripts(spark, numConvs)
    val edges = EdgeBuilder.edges(transcripts).persist()
    val g = TemporalGraph(edges)
    // prebuilt persisted CSR — the measured quantity is superstep
    // throughput, not adjacency build (BENCH.md methodology v2)
    val adj = g.adjacencyOut(maxShard).persist()
    val nodes = g.nodes.persist()
    adj.count(); nodes.count()
    println(s"[probe] cores=$cores skew=$skew maxShard=$maxShard edges=${g.simpleEdges.count()}")
    edges.unpersist(false)
    PageRank.runOnAdjacency(spark, adj, nodes, PageRank.Config(maxIter = 2, tol = 0.0))._1.count()

    val before = listener.snapshot()
    val t0 = System.nanoTime()
    val full = PageRank.runFull(spark, adj, nodes, PageRank.Config(maxIter = steps, tol = 0.0))
    full.state.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val d = listener.delta(before)
    println(f"[probe] measured=$wall%.1f s for $steps supersteps")
    // per-superstep walls + median — the burst-robust scaling quantity:
    // compare MEDIANS across core counts, not totals (one tenancy burst
    // poisons a total; see BENCH.md r3 notes)
    val walls = full.metrics.flatMap(_.get("wallMs")).map(_ / 1000.0)
    if (walls.nonEmpty) {
      val med = walls.sorted.apply(walls.size / 2)
      println(f"[probe] median_superstep=$med%.2f s " +
        f"walls=${walls.map(w => f"$w%.1f").mkString(",")}")
    }
    println(
      f"[probe] stages=${d("stages")}%.0f runTime=${d("runTimeMs") / 1000}%.1fs " +
        f"gcShare=${d("gcShare") * 100}%.1f%% cpuShare=${d("cpuShare") * 100}%.1f%% " +
        f"shufRead=${d("shuffleReadB") / 1e9}%.2fGB shufWrite=${d("shuffleWriteB") / 1e9}%.2fGB")

    val (_, _, calPost) = Calibration.cpuRatio(math.max(1, cores / 4), cores)
    println(f"[probe] calib_post ${cores / 4}->${cores} ratio=$calPost%.2f steal=${Calibration.stealPct()}%.1f%%")
    spark.stop()
  }
}
