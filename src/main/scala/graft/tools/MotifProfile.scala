package graft.algos

import org.apache.spark.sql.SparkSession

import graft.data.GraphGen

/** Diagnostic: cold + warm wall times of [[TemporalMotifs.global]] on the
  * Bench RA graph (attributed the round-3 driver-bench regression: the
  * unpersisted `oriented` frame was recomputed by three plan branches).
  * Not part of the driver contract. */
object MotifProfile {
  def main(args: Array[String]): Unit = {
    val nodes = args.headOption.map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[motif-profile] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }

    val g = GraphGen.randomAttachment(spark, nodes, 4)
    g.edges.count() // materialize generator input once
    time("global cold")(TemporalMotifs.global(spark, g, deltaMs = 5000L).count())
    time("global warm1")(TemporalMotifs.global(spark, g, deltaMs = 5000L).count())
    time("global warm2")(TemporalMotifs.global(spark, g, deltaMs = 5000L).count())
    time("local warm")(TemporalMotifs.local(spark, g, deltaMs = 5000L).count())
    spark.stop()
  }
}
