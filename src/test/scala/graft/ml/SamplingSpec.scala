package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic corpus-composition samplers ([[Sampling]]). */
class SamplingSpec extends SparkSpec {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hash sample is a pure function of (seed, id): partitioning-independent, rate-accurate") {
    val a = Sampling.hashSample(docs.repartition(7), rate = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(docs.repartition(3), rate = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq, "membership must not depend on partitioning")
    val n = docs.count().toDouble
    assert(a.length > n * 0.15 && a.length < n * 0.35, s"rate off: ${a.length} of $n")
    // different seed → different (but still deterministic) membership
    val c = Sampling.hashSample(docs, rate = 0.25, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(c.toSeq != a.toSeq)
    // both families deterministic across runs
    val p1 = Sampling.hashSample(docs, rate = 0.25, portable = true).count()
    val p2 = Sampling.hashSample(docs, rate = 0.25, portable = true).count()
    assert(p1 == p2)
  }

  test("portable hash is total on full-range / negative ids (ANSI) and rate-accurate") {
    import spark.implicits._
    // xxhash64-derived ids are full-range longs, including negatives: the
    // old (seed + id * 73856093) raised under ANSI for |id| ≳ 1.26e11 and
    // diverged from DuckDB's sign-preserving % for negative ids. The
    // pmod-first form must evaluate (no exception) and still sample ~rate.
    val wild = spark.range(0, 4000)
      .select(xxhash64(col("id")).as("doc_id")) // full-range, ~half negative
    assert(wild.filter(col("doc_id") < 0).count() > 1000)
    val kept = Sampling.hashSample(wild, rate = 0.25, portable = true).count().toDouble
    assert(kept > 4000 * 0.18 && kept < 4000 * 0.32, s"portable rate off: $kept / 4000")
    // partitioning-independent on the same wild ids
    val a = Sampling.hashSample(wild.repartition(7), rate = 0.25, portable = true)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(wild.repartition(3), rate = 0.25, portable = true)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("stratified quota takes exactly min(n, group size) per group, stably") {
    val out = Sampling.stratifiedQuota(docs, "source", n = 20)
    val sizes = out.groupBy("source").agg(count(lit(1)).as("k"))
      .join(docs.groupBy("source").agg(count(lit(1)).as("n_g")), Seq("source"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      assert(r.getLong(1) == math.min(20L, r.getLong(2)),
        s"group ${r.getString(0)}: took ${r.getLong(1)} of ${r.getLong(2)}")
    }
    assert(out.agg(max("sample_rank")).first().getLong(0) <= 20L)
    val again = Sampling.stratifiedQuota(docs.repartition(5), "source", n = 20)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(again.toSeq == out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("temperature mix: alpha=1 keeps natural proportions, alpha=0 flattens; never upsamples") {
    val total = 300L
    val census = docs.groupBy("source").agg(count(lit(1)).as("n_g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def sampledBy(alpha: Double) = Sampling.temperatureMix(docs, "source", total, alpha)
      .groupBy("source").agg(count(lit(1)).as("k"), first("sample_rate").as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val flat = sampledBy(0.0)
    val nat = sampledBy(1.0)
    // rates are valid probabilities and no group exceeds its size
    (flat ++ nat).foreach { case (g, k, r) =>
      assert(r >= 0.0 && r <= 1.0)
      assert(k <= census(g))
    }
    // alpha=0: equal per-group targets → small groups sampled at higher
    // rates than large ones; alpha=1: one global rate for every group
    val natRates = nat.map(_._3)
    assert(natRates.max - natRates.min < 0.02, s"alpha=1 rates should be ~equal: $natRates")
    val bySize = flat.sortBy { case (g, _, _) => census(g) }.map(_._3)
    assert(bySize.head >= bySize.last, s"alpha=0 should favor small groups: $flat")
    // total lands near the target (hash noise only)
    val got = nat.map(_._2).sum.toDouble
    assert(got > total * 0.7 && got < total * 1.3, s"alpha=1 total $got vs $total")
  }

  test("repeatWeighted: floor copies + deterministic fractional copy; unlisted groups drop") {
    val w = Map("src0" -> 3.4, "src1" -> 1.0, "src2" -> 0.5, "src3" -> 2.25, "src4" -> 0.0)
    val out = Sampling.repeatWeighted(docs, "source", w).persist()
    try {
      // every listed-group row appears floor(w) or floor(w)+1 times, keyed
      // by copy 1..copies; unlisted sources (and weight-0) never appear
      assert(out.select("source").distinct().collect().map(_.getString(0)).toSet ==
        Set("src0", "src1", "src2", "src3"))
      val perDoc = out.groupBy("doc_id", "source").agg(
        count(lit(1)).as("n"), max("copy").as("maxc")).collect()
      perDoc.foreach { r =>
        val base = math.floor(w(r.getString(1))).toLong
        assert(r.getLong(2) == base || r.getLong(2) == base + 1, s"bad copies: $r")
        assert(r.getLong(2) == r.getLong(3), "copy must run 1..copies")
      }
      // group mass tracks the weight (25 docs per source at sf0.001):
      // src0 ∈ [3·25, 4·25]; src1 exactly 25; src2 a strict subsample
      val mass = out.groupBy("source").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(mass("src0") >= 75L && mass("src0") <= 100L)
      assert(mass("src1") == 25L)
      assert(mass("src2") < 25L)
      assert(mass("src3") >= 50L && mass("src3") <= 75L)
      // membership/copies are partitioning-invariant
      val again = Sampling.repeatWeighted(docs.repartition(7), "source", w)
        .select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(again.toSeq ==
        out.select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
      // weights out of range are loud
      intercept[IllegalArgumentException](
        Sampling.repeatWeighted(docs, "source", Map("src0" -> 1000.0)))
    } finally out.unpersist(false)
  }

  test("clusterBalanced keeps min(perCluster, cluster size) per cluster, partition-invariant") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val km = Clustering.kmeans(vecs, k = 4, assignRounds = 2)
    val sizes = Clustering.kmeans(vecs, k = 4, assignRounds = 2).assignment
      .groupBy("cluster").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Sampling.clusterBalanced(vecs, km.centroids, perCluster = 30)
    val byCluster = out.groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (c, n) =>
      assert(n == math.min(30L, sizes(c)), s"cluster $c kept $n of ${sizes(c)}")
    }
    assert(out.select("rk").agg(max("rk")).first().getLong(0) <= 30L)
    // pure function of (seed, id): identical survivors under repartitioning
    val again = Sampling.clusterBalanced(
      vecs.repartition(13), km.centroids, perCluster = 30)
    assert(out.select("vec_id", "cluster", "rk").collect().toSet ==
      again.select("vec_id", "cluster", "rk").collect().toSet)
  }
}
