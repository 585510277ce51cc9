package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 curation operators: SemDeDup, corpus line dedup, the hashed
  * linear quality classifier, and the deterministic epoch shuffle. */
class CurationOpsSpec extends SparkSpec {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  // ---------- SemDeDup ----------

  test("semDedup groups semantic duplicates and keeps the member farthest from its centroid") {
    import spark.implicits._
    // two tight semantic-duplicate groups + one singleton, in 2D
    val v = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.999, 0.0447)), // cos(1,2) ≈ 0.999
      (3L, Seq(0.0, 1.0)),
      (4L, Seq(0.0447, 0.999)), // cos(3,4) ≈ 0.999
      (5L, Seq(-1.0, 0.02))     // near-orthogonal to both groups
    ).toDF("vec_id", "embedding")
    // nCells = 1: trivial quantizer so the test pins the pairing/keep rule
    // (with 2 cells the sampled pivots can land inside one dup group and
    // split it — correct SemDeDup behavior, recall bounded by the
    // quantizer, but not what this test is about)
    val out = SemDedup.semDedup(v, threshold = 0.99, nCells = 1, seed = 1L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5)
    // groups: {1,2} and {3,4} share clusters; 5 is a singleton
    assert(out(1L).getAs[Long]("cluster") == out(2L).getAs[Long]("cluster"))
    assert(out(3L).getAs[Long]("cluster") == out(4L).getAs[Long]("cluster"))
    assert(out(1L).getAs[Long]("cluster") != out(3L).getAs[Long]("cluster"))
    assert(out(5L).getAs[Long]("cluster_n") == 1L && out(5L).getAs[Boolean]("keep"))
    // exactly one keep per cluster, and it has the cluster's min ccos
    Seq(Seq(1L, 2L), Seq(3L, 4L)).foreach { grp =>
      val kept = grp.filter(id => out(id).getAs[Boolean]("keep"))
      assert(kept.size == 1, s"group $grp kept $kept")
      val minCcos = grp.map(id => out(id).getAs[Double]("ccos")).min
      assert(out(kept.head).getAs[Double]("ccos") == minCcos)
    }
  }

  test("semDedup invariants on the testdata embeddings: one keep per cluster, consistent sizes") {
    val out = SemDedup.semDedup(vecs, threshold = 0.35, nCells = 16, portable = true)
    val n = vecs.count()
    assert(out.count() == n, "one row per input vector")
    val byCluster = out.groupBy("cluster").agg(
      count(lit(1)).as("n"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      max("cluster_n").as("cn"),
      min("cluster_n").as("cn2"))
    assert(byCluster.filter(col("n_keep") =!= 1L).count() == 0, "exactly one keep per cluster")
    assert(byCluster.filter(col("n") =!= col("cn") || col("cn") =!= col("cn2")).count() == 0,
      "cluster_n must equal the actual cluster size")
    // it actually dedups on this data (non-trivial clusters exist at 0.35)
    assert(out.filter(col("cluster_n") > 1).count() > 0, "no semantic clusters formed — threshold too high for fixture")
    // members of one cluster share a cell (pairs only form within cells)
    val multi = out.filter(col("cluster_n") > 1)
    assert(multi.groupBy("cluster").agg(countDistinct("cell").as("k"))
      .filter(col("k") =!= 1L).count() == 0)
  }

  test("semDedupTrained over k-means centroids: same invariants, trained cells") {
    val km = Clustering.kmeans(vecs, k = 8, assignRounds = 2)
    val out = SemDedup.semDedupTrained(vecs, threshold = 0.35, centroids = km.centroids)
    assert(out.count() == vecs.count(), "one row per input vector")
    val byCluster = out.groupBy("cluster").agg(
      count(lit(1)).as("n"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      max("cluster_n").as("cn"))
    assert(byCluster.filter(col("n_keep") =!= 1L).count() == 0, "exactly one keep per cluster")
    assert(byCluster.filter(col("n") =!= col("cn")).count() == 0)
    // cells come from the trained table: every assigned cell is a rank 1..8
    val cells = out.select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf((1L to 8L).toSet) && cells.nonEmpty)
    // members of one cluster share a cell (pairs only form within cells)
    assert(out.filter(col("cluster_n") > 1).groupBy("cluster")
      .agg(countDistinct("cell").as("k")).filter(col("k") =!= 1L).count() == 0)
  }

  test("semDedup portable sampler is total on full-range / negative ids (ANSI)") {
    import spark.implicits._
    // xxhash64-scale ids: the old raw id*1103515245 pivot hash raised
    // under ANSI past |id| ~ 8.4e9; the pmod-first form must evaluate
    val wild = spark.range(0, 200)
      .select(
        xxhash64(col("id")).as("vec_id"),
        array((0 until 4).map(i => (rand(i).cast("float"))): _*).as("embedding"))
    val out = SemDedup.semDedup(wild, threshold = 0.99, nCells = 4, portable = true)
    assert(out.count() == 200)
    assert(out.filter(col("keep")).count() > 0)
  }

  test("semDedupDropped reports oversized cells instead of silently pairing them") {
    val dropped = SemDedup.semDedupDropped(vecs, nCells = 2, maxCell = 10, portable = true)
    // 500 vectors over 2 cells → both cells exceed 10 and must be reported
    assert(dropped.count() == 2)
    assert(dropped.agg(sum("cell_n")).first().getLong(0) == vecs.count())
  }

  // ---------- corpus line dedup ----------

  test("dedupLines keeps only the globally-first occurrence of a repeated line") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha\ncommon line\nbeta"),
      (2L, "gamma\ncommon line\ndelta"),
      (3L, "common line\n\nrepeat\nrepeat")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(d).collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 holds the first occurrence (smallest doc_id, idx) → untouched
    assert(out(1L).getAs[String]("clean_text") == "alpha\ncommon line\nbeta")
    assert(out(1L).getAs[Long]("n_kept") == 3L)
    // doc 2 loses the repeated line
    assert(out(2L).getAs[String]("clean_text") == "gamma\ndelta")
    assert(out(2L).getAs[Long]("n_lines") == 3L && out(2L).getAs[Long]("n_kept") == 2L)
    // doc 3: repeated line removed, blank line survives, within-doc repeat
    // keeps only its first occurrence
    assert(out(3L).getAs[String]("clean_text") == "\nrepeat")
    assert(out(3L).getAs[Long]("n_kept") == 2L)
  }

  test("lineCensus counts occurrences and documents per repeated line") {
    import spark.implicits._
    val d = Seq(
      (1L, "a\nb"),
      (2L, "b\nc\nb"),
      (3L, "c")
    ).toDF("doc_id", "text")
    val c = Dedup.lineCensus(d).collect()
      .map(r => r.getAs[String]("sample_line") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))).toMap
    assert(c("b") == (2L, 3L))
    assert(c("c") == (2L, 2L))
    assert(!c.contains("a"), "singleton lines are below minOccurrences")
  }

  // ---------- sliding-window chunking ----------

  test("chunkDocuments covers every token, never crosses doc boundaries, overlaps by chunk−stride") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, (1 to 8).map(i => s"u$i").mkString(" "))   // exact multiple: n−c divisible by stride
    ).toDF("doc_id", "text")
    val out = CorpusOps.chunkDocuments(d, chunkTokens = 4, stride = 2)
      .collect().groupBy(_.getLong(0))
    // doc 1: starts 0,2,4,6 → 4 chunks; ragged none (6+4=10 exact)
    val c1 = out(1L).sortBy(_.getAs[Long]("chunk_idx"))
    assert(c1.map(_.getAs[Long]("start_tok")).toSeq == Seq(0L, 2L, 4L, 6L))
    assert(c1.map(_.getAs[Long]("n_toks")).toSeq == Seq(4L, 4L, 4L, 4L))
    assert(c1.head.getAs[String]("chunk_text") == "t1 t2 t3 t4")
    assert(c1.last.getAs[String]("chunk_text") == "t7 t8 t9 t10")
    // doc 2: one ragged chunk
    assert(out(2L).length == 1 && out(2L).head.getAs[Long]("n_toks") == 3L)
    assert(out(2L).head.getAs[String]("chunk_text") == "a b c")
    // doc 3 (n=8, c=4, s=2): starts 0,2,4 — no empty trailing chunk
    assert(out(3L).map(_.getAs[Long]("start_tok")).sorted.toSeq == Seq(0L, 2L, 4L))
    // coverage: every token index of doc 1 falls in some chunk
    val covered = c1.flatMap(r => r.getAs[Long]("start_tok") until
      (r.getAs[Long]("start_tok") + r.getAs[Long]("n_toks"))).toSet
    assert(covered == (0L until 10L).toSet)
  }

  // ---------- hashed linear classifier ----------

  test("classifierScore is deterministic, partitioning-independent, and bounded") {
    val a = TextAnalysis.classifierScore(docs).orderBy("doc_id").collect()
    val b = TextAnalysis.classifierScore(docs.repartition(7)).orderBy("doc_id").collect()
    assert(a.length == docs.count())
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "score must not depend on partitioning")
    a.foreach { r =>
      val score = r.getAs[Double]("score")
      assert(score >= -1.0 && score <= 1.0, s"score $score out of [-1, 1]")
      assert(r.getAs[Boolean]("keep") == (score > 0) || score == 0.0)
      assert(r.getAs[Long]("n_tokens") > 0)
    }
    // a different seed is a different model
    val c = TextAnalysis.classifierScore(docs, seed = 99L).orderBy("doc_id").collect()
    assert(c.map(_.getAs[Double]("score")).toSeq != a.map(_.getAs[Double]("score")).toSeq)
  }

  // ---------- physical-plan shapes (the 100 TB contract) ----------

  test("plan shapes: classifier shuffles once with map-side partial agg; shuffle/line-dedup never range-partition") {
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try df.queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    // classifier: explode → groupBy(doc) — exactly ONE exchange, and the
    // token-level sum/count must partially aggregate before it
    val clfPlan = planOf(TextAnalysis.classifierScore(docs))
    val nEx = "Exchange hashpartitioning".r.findAllIn(clfPlan).size
    assert(nEx == 1, s"classifier must shuffle exactly once, saw $nEx:\n$clfPlan")
    assert(clfPlan.contains("partial_"), s"map-side partial agg missing:\n$clfPlan")
    assert(!clfPlan.contains("rangepartitioning"), clfPlan)
    // epoch shuffle: one hash exchange on shard; NO rangepartitioning (a
    // global sort would serialize the corpus through one task chain)
    val shPlan = planOf(Sampling.epochShuffle(docs, nShards = 8, portable = true))
    assert(!shPlan.contains("rangepartitioning"), s"global sort leaked in:\n$shPlan")
    // corpus line dedup: census + reassembly are hash exchanges only
    val ldPlan = planOf(Dedup.dedupLines(docs))
    assert(!ldPlan.contains("rangepartitioning"), s"global sort leaked in:\n$ldPlan")
    // chunking is a pure map: NO exchange at all
    val chPlan = planOf(CorpusOps.chunkDocuments(docs, chunkTokens = 64, stride = 48))
    assert(!chPlan.contains("Exchange"), s"chunking must not shuffle:\n$chPlan")
  }

  // ---------- epoch shuffle ----------

  test("epochShuffle is a total, deterministic, epoch-varying permutation with no global sort") {
    val n = docs.count()
    val out = Sampling.epochShuffle(docs, nShards = 8, seed = 42L, epoch = 0, portable = true)
    assert(out.count() == n)
    // (shard, pos) is a dense 1..k numbering per shard — a real permutation
    assert(out.select("shard", "pos").distinct().count() == n)
    val perShard = out.groupBy("shard").agg(count(lit(1)).as("k"), max("pos").as("mx"))
    assert(perShard.filter(col("k") =!= col("mx")).count() == 0, "pos must be dense per shard")
    assert(perShard.count() <= 8)
    // partitioning-independent
    val again = Sampling.epochShuffle(docs.repartition(5), nShards = 8, seed = 42L, epoch = 0, portable = true)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect().map(_.toSeq).toSeq
    val base = out.select("doc_id", "shard", "pos").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(again == base)
    // a new epoch is a different permutation
    val e1 = Sampling.epochShuffle(docs, nShards = 8, seed = 42L, epoch = 1, portable = true)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(e1 != base)
    // xxhash64 family is total on full-range ids too (ANSI-safe)
    import spark.implicits._
    val wild = spark.range(0, 1000).select(xxhash64(col("id")).as("doc_id"))
    val w = Sampling.epochShuffle(wild, nShards = 4, seed = 1L, epoch = 2)
    assert(w.count() == 1000 && w.select("shard", "pos").distinct().count() == 1000)
  }
}
