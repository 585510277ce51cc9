package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed Lloyd's k-means over an embedding column (the trained
 * quantizer the SemDeDup / IVF family assumes upstream — see
 * [[SemDedup]]'s doc note "the paper uses k-means"; this is that trainer,
 * kept oracle-replayable).
 *
 * The 100 TB shape — the corpus is NEVER shuffled:
 *  - centroids are k driver-side rows embedded as a LITERAL array column,
 *    so each assignment pass is a pure map-side argmin (whole-stage
 *    codegen, no join, no exchange over the corpus);
 *  - the M-step posexplodes vectors and partially aggregates
 *    (cluster, dim) sums map-side, so its exchange carries at most
 *    partitions x k x dim rows — never n rows;
 *  - the only collects are k x dim mean cells per round (bounded, the
 *    BPE one-row-per-round precedent).
 *
 * Determinism (full DuckDB replay, the pinned-round Louvain/MIS
 * precedent):
 *  - init = the portable-LCG sampled pivots shared with
 *    [[Similarity.ivfTopK]] / [[SemDedup]] (rank order exact on both
 *    engines);
 *  - squared-L2 distances are rounded to 6 dp BEFORE the argmin, ties
 *    broken by centroid rank — associative `array_min` over
 *    struct(dist, rank);
 *  - per-round centroid means are rounded to 6 dp on both engines, so
 *    float-summation order can never drift the state between rounds;
 *  - a centroid whose cluster empties retains its previous value
 *    (coalesce on both engines).
 */
object Clustering {

  /** @param assignment one row per corpus vector:
    *   (id, cluster: long rank 1..k, dist: squared L2 to its centroid,
    *    cluster_n: long cluster size)
    * @param centroids the final per-rank centroid vectors (post the last
    *   completed M-step; the assignment is measured against exactly these)
    */
  final case class KMeansResult(
      assignment: DataFrame,
      centroids: Array[(Int, Array[Double])],
      rounds: Int)

  /** round(sum_i (v_i - c_i)^2, 6) — the fold is sequential on both
    * engines; 6-dp rounding before the argmin pins cross-engine FP. */
  private def sqDist(v: Column, cv: Column): Column =
    round(
      aggregate(
        zip_with(v, cv, (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0),
        (acc, d) => acc + d),
      6)

  /** Deterministic initial centroids: the first k corpus vectors by the
    * portable LCG hash (identical to [[SemDedup]]'s pivot sampler), cast
    * exactly to double. */
  private def initCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      seed: Long,
      portable: Boolean): Array[(Int, Array[Double])] = {
    val h =
      if (portable) expr(s"(pmod($idCol, 1000000007L) * 1103515245L + 12345L) % 1000000007L")
      else xxhash64(lit(seed), col(idCol))
    corpus
      .select(col(idCol).as("pid"), col(vecCol).as("pv"), h.as("h"))
      .orderBy(col("h"), col("pid"))
      .limit(k)
      .withColumn("crank", row_number().over(Window.orderBy(col("h"), col("pid"))))
      .select(col("crank"), expr("transform(pv, x -> CAST(x AS DOUBLE))").as("cv"))
      .collect() // k rows — bounded by construction
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
  }

  /** Map-side argmin against the LITERAL centroid array: adds
    * (cluster, dist) with zero shuffle. Package-visible so samplers and
    * curation ops can label against trained centroids without rerunning
    * the trainer. */
  private[ml] def assign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[(Int, Array[Double])]): DataFrame = {
    val cenLit = array(cents.map { case (r, cv) =>
      struct(lit(r).as("crank"), typedlit(cv.toSeq).as("cv"))
    }: _*)
    corpus
      .select(col(idCol), col(vecCol))
      .withColumn(
        "best",
        array_min(transform(
          cenLit,
          c => struct(sqDist(col(vecCol), c.getField("cv")).as("d"), c.getField("crank").as("crank")))))
      .select(
        col(idCol),
        col(vecCol),
        col("best.crank").as("cluster"),
        col("best.d").as("dist"))
  }

  /** One M-step: element-wise cluster means (rounded 6 dp), collected as
    * at most k x dim cells; empty clusters keep their previous centroid. */
  private def meanStep(
      assigned: DataFrame,
      vecCol: String,
      prev: Array[(Int, Array[Double])]): Array[(Int, Array[Double])] = {
    val cells = assigned
      .select(col("cluster"), posexplode(col(vecCol)))
      .groupBy(col("cluster"), col("pos"))
      .agg(round(avg(col("col").cast("double")), 6).as("m"))
      .collect() // <= k x dim rows — bounded by construction
    val byCluster = cells
      .groupBy(_.getInt(0))
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    prev.map { case (r, old) => r -> byCluster.getOrElse(r, old) }
  }

  /** @param assignRounds number of assignment passes; the M-step runs
    *   after every pass but the last, so the returned assignment is
    *   measured against the returned (final) centroids.
    * @note the corpus is scanned once per round for the M-step and twice
    *   for the final output (the cluster-sizes aggregate is a separate
    *   branch — broadcast-joined back rather than windowed, because a
    *   window over `cluster` would shuffle the whole corpus onto k keys);
    *   persist the input if scans dominate. */
  def kmeans(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      k: Int = 8,
      assignRounds: Int = 3,
      seed: Long = 42L,
      portable: Boolean = true): KMeansResult = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(assignRounds >= 1, s"assignRounds must be >= 1, got $assignRounds")
    var cents = initCentroids(corpus, idCol, vecCol, k, seed, portable)
    require(cents.nonEmpty, "kmeans on an empty corpus")
    var assigned: DataFrame = null
    var round = 0
    while (round < assignRounds) {
      assigned = assign(corpus, idCol, vecCol, cents)
      round += 1
      if (round < assignRounds) cents = meanStep(assigned, vecCol, cents)
    }
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("cluster_n"))
    val out = assigned
      .join(broadcast(sizes), Seq("cluster"))
      .select(
        col(idCol),
        col("cluster").cast("long").as("cluster"),
        col("dist"),
        col("cluster_n"))
    KMeansResult(out, cents, assignRounds)
  }
}
