package graft.tools

import org.apache.spark.sql.SparkSession
import graft.data.TranscriptGen
import graft.graph.{EdgeBuilder, TemporalGraph}
import graft.algos.PageRank

/** Diagnostic for the scaling gate: one PageRank run at a given core count
  * with togglable skew-join / CSR-salting, per-superstep wall times on
  * stderr (GRAFT_VERBOSE). Usage:
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
    val transcripts = TranscriptGen.transcripts(spark, numConvs)
    val edges = EdgeBuilder.edges(transcripts).persist()
    val g = TemporalGraph(edges)
    println(s"[probe] cores=$cores skew=$skew maxShard=$maxShard edges=${g.simpleEdges.count()}")
    PageRank.run(spark, g, PageRank.Config(maxIter = 2, tol = 0.0, maxShard = maxShard)).count()
    val t0 = System.nanoTime()
    PageRank.run(spark, g, PageRank.Config(maxIter = steps, tol = 0.0, maxShard = maxShard)).count()
    println(f"[probe] measured=${(System.nanoTime() - t0) / 1e9}%.1f s for $steps supersteps")
    spark.stop()
  }
}
