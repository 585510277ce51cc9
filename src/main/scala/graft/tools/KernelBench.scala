package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Similarity

/**
 * Micro-bench for the native kernels vs the composed-builtins forms they
 * replaced — the evidence behind choosing custom Catalyst `Expression`s on
 * the ANN / dedup hot paths.
 *
 * Modes:
 *  - `cosine` (default): [[Similarity.cosine]] vs [[Similarity.cosineSql]]
 *    on the full |C|×|C| cosine matrix of the embeddings table (sf0.1:
 *    2000 × 2000 = 4M pairs × dim 64), reduced to one checksum so nothing
 *    but the kernel differs between the two plans.
 *  - `sketch`: MinHash signature / SimHash fingerprint / hyperplane band
 *    signature / hash embedding, each kernel-vs-SQL on the documents and
 *    embeddings tables, base hashes computed identically on both plans so
 *    only the sketch loop differs.
 *
 * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... runMain
 * graft.tools.KernelBench [cosine|sketch] [reps]
 */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = args.headOption.filterNot(_.forall(_.isDigit)).getOrElse("cosine")
    val reps = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "sketch") {
      benchSketch(spark, sfDir, reps)
      spark.stop()
      return
    }

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

  /** Kernel-vs-SQL for the sketch expressions. Each workload reduces to one
    * checksum; the base token/shingle hashing is shared verbatim by both
    * plans, so the delta is the sketch loop alone. The xxhash64 family is
    * benched (the production default; the portable family has the same loop
    * structure with cheaper per-step arithmetic). */
  private def benchSketch(spark: SparkSession, sfDir: String, reps: Int): Unit = {
    import graft.functions.HashExpressions
    import graft.ml.Dedup

    def median(label: String, df: => org.apache.spark.sql.DataFrame): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val s = df.first()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[kernel] $label: $dt%.2f s (checksum $s)")
        dt
      }.sorted
      times(times.size / 2)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).persist()
    val nDocs = docs.count()
    val shingled = docs
      .withColumn("__shingles", Dedup.shingles("text", 3))
      .withColumn("__hs", expr("transform(__shingles, s -> xxhash64(s))"))
    val tokened = docs
      .withColumn("__th", expr("transform(split(text, '\\\\s+'), tok -> xxhash64(tok))"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).persist()
    val nVecs = emb.count()
    val banded = emb.withColumn("band", explode(expr("sequence(0, 15)")))
    val embedder = graft.vectors.HashEmbedder(dim = 64, seed = 42L)

    def pair(name: String, fast: => org.apache.spark.sql.DataFrame,
        sql: => org.apache.spark.sql.DataFrame): Unit = {
      median(s"warmup-$name-native", fast); median(s"warmup-$name-sql", sql)
      val tN = median(s"$name-native", fast)
      val tS = median(s"$name-sql", sql)
      println(f"[kernel] $name: native=$tN%.2f s hof=$tS%.2f s speedup=${tS / tN}%.2f x")
    }

    println(s"[kernel] sketch mode: $nDocs docs, $nVecs vectors")
    // checksums fold to double — ANSI mode would raise on a long sum of
    // 64-bit hash values
    pair("minhash128",
      shingled.select(sum(element_at(
        HashExpressions.minHashSig(col("__hs"), 128, portable = false), 1).cast("double")).as("s")),
      shingled.select(sum(element_at(
        expr(Dedup.minHashSigSql(128, portable = false)), 1).cast("double")).as("s")))
    pair("simhash",
      tokened.select(sum(
        HashExpressions.simHash(col("__th"), portable = false).cast("double")).as("s")),
      tokened.select(sum(expr(Dedup.simHashSql(portable = false)).cast("double")).as("s")))
    pair("planesig16x16",
      banded.select(sum(
        HashExpressions.planeSig(col("embedding"), col("band"), 16, 42L, portable = false)
          .cast("double")).as("s")),
      emb.select(Similarity.bandedSigSql("embedding", 16, 16, 42L, portable = false).as("bs"))
        .select(sum(col("bs.sig").cast("double")).as("s")))
    pair("hashembed64",
      docs.select(sum(element_at(embedder.embed("text"), 1)).as("s")),
      docs.select(sum(element_at(embedder.embedSql("text"), 1)).as("s")))
  }
}
