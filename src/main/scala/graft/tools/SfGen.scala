package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver testdata for robustness passes at
  * SFs the driver does not ship (BENCH.md round-5 sf1 pass; VERDICT r4
  * item 7). Replicates the four Bench-consumed tables `copies`× with
  * id-space shifts so the output is a valid, larger instance of the same
  * schema — never external data, never a mutation of /root/testdata:
  *
  *  - events: event_id/user_id shifted per copy; timestamps kept, so the
  *    per-event-type lead() edge build interleaves copies into ONE graph
  *    `copies`× the size (not `copies` disjoint clones).
  *  - documents: doc_id shifted; copies >0 get a two-token deterministic
  *    suffix so exact/near-dup census rates stay in the sf0.1 band rather
  *    than collapsing to everything-is-a-dup; n_chars kept consistent.
  *  - embeddings: vec_id shifted; one dimension nudged by a per-copy
  *    deterministic epsilon so cosine ties do not become exact across
  *    copies (top-k boundaries keep sf0.1-like selectivity).
  *  - lineitem: l_orderkey shifted (q_agg_groupby's input).
  *
  * Usage: runMain graft.tools.SfGen <srcSfDir> <destDir> <copies>
  */
object SfGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: SfGen <srcSfDir> <destDir> <copies>")
    val (src, dest, copies) = (args(0), args(1), args(2).toInt)
    require(copies >= 1 && copies <= 100, s"copies=$copies out of [1,100]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String)(shift: (DataFrame, Int, Long) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val span = 1L << 40 // far above any testdata id; keeps copies' id ranges disjoint
      val out = (0 until copies).map(k => shift(base, k, span * k)).reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[sfgen] $name: ${base.count()} x $copies")
    }

    replicate("events") { (df, _, off) =>
      df.withColumn("event_id", col("event_id") + off)
        .withColumn("user_id", col("user_id") + off)
    }
    replicate("documents") { (df, k, off) =>
      val salted =
        if (k == 0) df
        else df.withColumn("text", concat(col("text"), lit(s" copymark c$k")))
      salted
        .withColumn("doc_id", col("doc_id") + off)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicate("embeddings") { (df, k, off) =>
      val nudged =
        if (k == 0) df
        else
          df.withColumn(
            "embedding",
            transform(
              col("embedding"),
              (v, i) => when(i === 0, v + lit(k * 1e-4f)).otherwise(v)))
      nudged.withColumn("vec_id", col("vec_id") + off)
    }
    replicate("lineitem") { (df, _, off) =>
      df.withColumn("l_orderkey", col("l_orderkey") + off)
    }
    spark.stop()
  }
}
