package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus-composition operators for training-data pipelines.
 * `df.sample()` is seed-stable only per partitioning — repartition the
 * corpus and the sample changes, which breaks reproducibility audits. These
 * samplers decide per ROW from a hash of the row's id, so membership is a
 * pure function of (id, seed): stable under repartitioning, re-runs,
 * engine versions — and replayable by the DuckDB oracle in the portable
 * family.
 *
 * Scale shape: [[hashSample]] is a stateless filter (pushes to the scan
 * side, no shuffle). [[stratifiedQuota]] is one window per group — the
 * shuffle is on the group key; skewed groups are bounded by the quota
 * itself. [[temperatureMix]] (Pile/ROOTS-style α-mixing) computes per-group
 * rates from a tiny group census (broadcast back) and then degenerates to
 * the stateless filter.
 */
object Sampling {

  private val P = 1000000007L

  /** Hash-uniform value in [0, 1e6) from (seed, id column).
    *
    * Portable form reduces the id mod P FIRST: the raw `id * 73856093`
    * would overflow (and raise, under Spark 4's default ANSI mode) for
    * |id| ≳ 1.26e11 — e.g. xxhash64-derived ids — and for negative ids
    * Spark's pmod diverges from DuckDB's sign-preserving `%`. After
    * `pmod(id, P)` every intermediate is in [0, P·73856093) ≪ 2^63 and
    * non-negative, so plain `%` agrees across engines; the oracle SQL
    * mirrors this exact form. */
  private def hashU(id: Column, seed: Long, portable: Boolean): Column =
    if (portable) {
      val s = ((seed % P) + P) % P // normalize driver-side: non-negative literal
      (lit(s) + pmod(id.cast("long"), lit(P)) * 73856093L) % P % 1000000L
    } else
      pmod(xxhash64(lit(seed), id), lit(1000000L))

  /** Keep each row iff hash(seed, id) < rate·1e6 — deterministic,
    * partitioning-independent Bernoulli(rate) sample. */
  def hashSample(
      df: DataFrame,
      idCol: String = "doc_id",
      rate: Double = 0.1,
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate=$rate out of [0, 1]")
    df.filter(hashU(col(idCol), seed, portable) < math.round(rate * 1e6))
  }

  /** Deterministic per-group quota: the `n` rows of each group with the
    * smallest (hash, id) — a stable "take n per source/language" that does
    * not depend on row order. Adds a `sample_rank` column (1-based). */
  def stratifiedQuota(
      df: DataFrame,
      groupCol: String,
      n: Int,
      idCol: String = "doc_id",
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(n > 0, s"n=$n must be positive")
    val w = Window.partitionBy(groupCol)
      .orderBy(hashU(col(idCol), seed, portable), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }

  /**
   * Temperature-mixed sample across groups (the Pile / ROOTS α-mixing
   * rule): group g's target share ∝ n_g^α, so α = 1 keeps natural
   * proportions and α → 0 flattens the mix toward uniform-per-group. The
   * per-group keep RATE is min(1, total·share_g / n_g) — groups whose
   * target exceeds their size are kept whole (no upsampling; the
   * shortfall is reported, not silently redistributed).
   *
   * @param total target sampled row count across all groups
   * @return sampled rows plus (group-constant) `sample_rate` column
   */
  def temperatureMix(
      df: DataFrame,
      groupCol: String,
      total: Long,
      alpha: Double = 0.5,
      idCol: String = "doc_id",
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha out of [0, 1]")
    val census = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
    val shares = census
      .withColumn("w", pow(col("n_g").cast("double"), alpha))
      .withColumn("share", col("w") / sum("w").over(Window.partitionBy()))
      // per-row keep threshold in hash units, rounded once so both engines
      // compare integers, never floats
      .withColumn(
        "thr",
        least(
          lit(1000000L),
          round(lit(total) * col("share") / col("n_g") * 1e6, 0).cast("long")))
      .select(col(groupCol), (col("thr").cast("double") / 1e6).as("sample_rate"), col("thr"))
    df.join(broadcast(shares), Seq(groupCol))
      .filter(hashU(col(idCol), seed, portable) < col("thr"))
      .drop("thr")
  }

  /**
   * Deterministic weighted repetition — the multi-epoch mixture rule
   * (GPT-3's Table 2.2 / Llama-1's "Wikipedia, 3.4 epochs"): every row of
   * group g is emitted floor(w_g) times, plus one more copy with
   * probability frac(w_g), so the group's expected row mass scales by
   * exactly w_g. One op covers up-sampling (w > 1 — what
   * [[temperatureMix]] deliberately never does) and down-sampling
   * (w < 1 degenerates to a Bernoulli(w) keep). The fractional-copy
   * decision is the same pure function of (seed, id) as the other
   * samplers, so the composed corpus replays bit-identically on any
   * partitioning (and in the oracle, in the portable family). Groups
   * absent from `epochs` are dropped (an explicit weight 0) — mixtures
   * must name their members. The emitted `copy` column (1-based) makes
   * each repetition addressable downstream: [[epochShuffle]] over
   * (id, copy) spreads copies through the training order, and dedup
   * audits can count them.
   *
   * Scale shape: tiny broadcast weight table, then a pure map — explode
   * over a per-row `sequence(1, copies)` with copies ≤ ceil(w); ZERO
   * shuffle, output size is Σ n_g·w_g in expectation by construction.
   * `maxEpochs` caps the blowup a typo'd weight could cause.
   */
  def repeatWeighted(
      df: DataFrame,
      groupCol: String,
      epochs: Map[String, Double],
      idCol: String = "doc_id",
      seed: Long = 42L,
      portable: Boolean = false,
      maxEpochs: Double = 100.0): DataFrame = {
    require(epochs.nonEmpty, "repeatWeighted: epochs map must not be empty")
    epochs.foreach { case (g, w) =>
      require(w >= 0.0 && w <= maxEpochs, s"repeatWeighted: weight $w for '$g' out of [0, $maxEpochs]")
    }
    val spark = df.sparkSession
    import spark.implicits._
    // integer-threshold split driver-side: base whole copies + the
    // fractional copy's hash threshold in the samplers' 1e6 grid
    val weights = epochs.toSeq.map { case (g, w) =>
      (g, math.floor(w).toLong, math.round((w - math.floor(w)) * 1e6))
    }.toDF(groupCol, "__base", "__thr")
    df.join(broadcast(weights), Seq(groupCol))
      .withColumn(
        "__copies",
        col("__base") +
          when(hashU(col(idCol), seed, portable) < col("__thr"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__base", "__thr", "__copies")
  }

  /**
   * Deterministic epoch shuffle — the global training-order permutation a
   * data loader consumes, as a pure function of (seed, epoch, id): row →
   * (shard, position-in-shard), where the concatenation shard 0 ‖ shard 1
   * ‖ … in position order IS the epoch's order. Same input + same (seed,
   * epoch) → identical order on any partitioning, engine or rerun; a new
   * epoch is a new full-range hash, i.e. an independent permutation —
   * `df.orderBy(rand(seed))` gives neither property.
   *
   * Scale shape: NO global sort. One exchange on `shard` (nShards
   * spread uniformly by the hash), then a per-shard window sorts
   * |corpus|/nShards rows — exactly how sharded training-data loaders
   * consume order anyway (rank files, read each sequentially). The hash is
   * full-range (mod P ≈ 2^30, not the samplers' 10^6 grid) so ties are
   * ~n²/2P-rare and broken by id, keeping the order total and replayable.
   *
   * @return input columns plus (shard, pos) — pos is 1-based within shard
   */
  def epochShuffle(
      df: DataFrame,
      idCol: String = "doc_id",
      nShards: Int = 256,
      seed: Long = 42L,
      epoch: Int = 0,
      portable: Boolean = false): DataFrame = {
    require(nShards > 0, s"nShards=$nShards must be positive")
    // fold the epoch into the seed so each epoch draws a fresh permutation
    val es = seed * 1000003L + epoch
    val h =
      if (portable) {
        val s = ((es % P) + P) % P
        (lit(s) + pmod(col(idCol).cast("long"), lit(P)) * 73856093L) % P
      } else pmod(xxhash64(lit(es), col(idCol)), lit(P))
    val w = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Cluster-balanced selection over an embedding corpus: label each
    * vector against TRAINED k-means centroids ([[Clustering.kmeans]]
    * output — a map-side argmin, zero corpus shuffle) and keep an equal
    * quota per cluster, chosen by the deterministic id hash. The
    * standard diversity-preserving curation step: uniform sampling
    * over-represents dense semantic regions; a per-cluster quota keeps
    * the tail (cf. SemDeDup §5's cluster-balanced ablations and
    * DataComp-style cluster pruning).
    *
    * One exchange, keyed by cluster — parallelism is bounded by k, so
    * size k to the cluster's core count at scale (the [[SemDedup]]
    * sizing rule). Selection is a pure function of (seed, id): the same
    * rows survive under any partitioning.
    *
    * @return (idCol, cluster: long, rk: long rank within its cluster,
    *         1-based, <= perCluster)
    */
  def clusterBalanced(
      corpus: DataFrame,
      centroids: Array[(Int, Array[Double])],
      perCluster: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(perCluster >= 1, s"perCluster=$perCluster must be positive")
    val w = Window.partitionBy("cluster").orderBy(col("__h"), col(idCol))
    Clustering.assign(corpus, idCol, vecCol, centroids)
      .withColumn("__h", hashU(col(idCol), seed, portable))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perCluster)
      .select(col(idCol), col("cluster").cast("long").as("cluster"), col("rk"))
  }
}
