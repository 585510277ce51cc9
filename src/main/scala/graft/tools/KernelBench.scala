package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Similarity

/**
 * Micro-bench for the native cosine kernel vs the composed-builtins form
 * it replaced ([[Similarity.cosine]] vs [[Similarity.cosineSql]]) — the
 * evidence behind choosing a custom Catalyst `Expression` on the ANN
 * brute-force/rerank path. Workload: the full |C|×|C| cosine matrix of the
 * embeddings table (sf0.1: 2000 × 2000 = 4M pairs × dim 64), reduced to
 * one checksum so nothing but the kernel differs between the two plans.
 *
 * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... runMain
 * graft.tools.KernelBench [reps]
 */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).persist()
    val n = emb.count()
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b)

    def run(label: String, kernel: org.apache.spark.sql.Column): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val s = pairs.select(sum(kernel).as("s")).first().getDouble(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[kernel] $label: $dt%.2f s (checksum $s%.6f)")
        dt
      }.sorted
      times(times.size / 2)
    }

    // warm both plans once (codegen compile + JIT)
    run("warmup-native", Similarity.cosine("va", "vb"))
    run("warmup-sql", Similarity.cosineSql("va", "vb"))
    val tNative = run("native", Similarity.cosine("va", "vb"))
    val tSql = run("hof-sql", Similarity.cosineSql("va", "vb"))
    println(f"[kernel] n=$n pairs=${n * n} native=$tNative%.2f s hof=$tSql%.2f s speedup=${tSql / tNative}%.2f x")
    spark.stop()
  }
}
