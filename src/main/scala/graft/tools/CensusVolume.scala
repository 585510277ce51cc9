package graft.tools

import org.apache.spark.sql.SparkSession

import graft.bench.Calibration
import graft.ml.Dedup

/** Measures the REAL shuffle volume of the substring-dedup census
  * ([[Dedup.duplicateSpans]]'s `groupBy(wh)` — the library's largest
  * exchange at scale) on a testdata corpus, alongside the logical
  * accounting from [[Dedup.duplicateSpansStats]]. Results are recorded in
  * BENCH.md. Usage: runMain graft.tools.CensusVolume [sfDir] */
object CensusVolume {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val listener = new Calibration.StageMetricsListener
    spark.sparkContext.addSparkListener(listener)

    val before = listener.snapshot()
    val t0 = System.nanoTime()
    val nSpans = Dedup.duplicateSpans(docs, minTokens = 8, minDocs = 2).count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let stage-completed events drain
    val after = listener.snapshot()

    val stats = Dedup.duplicateSpansStats(docs, minTokens = 8, minDocs = 2).collect()(0)
    println(
      s"""{"metric":"census_volume","sf":"$sfDir","spans":$nSpans,"secs":$secs,""" +
        s""""shuffle_write_bytes":${after("shuffleWriteB") - before("shuffleWriteB")},""" +
        s""""shuffle_read_bytes":${after("shuffleReadB") - before("shuffleReadB")},""" +
        s""""n_windows":${stats.getAs[Long]("n_windows")},""" +
        s""""n_distinct_hashes":${stats.getAs[Long]("n_distinct_hashes")},""" +
        s""""n_dup_hashes":${stats.getAs[Long]("n_dup_hashes")},""" +
        s""""n_dup_windows":${stats.getAs[Long]("n_dup_windows")},""" +
        s""""census_shuffle_bytes_est":${stats.getAs[Long]("census_shuffle_bytes_est")}}""")
    spark.stop()
  }
}
