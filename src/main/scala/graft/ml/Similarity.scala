package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths, mirroring what a 100 TB pipeline needs:
 *  - [[bruteForceTopK]]: exact cosine top-k via a broadcast join of the
 *    query set against the corpus — the correctness baseline. O(|Q|·|C|)
 *    dot products but embarrassingly parallel and codegen'd
 *    (`zip_with` + `aggregate`, no UDF).
 *  - [[lshTopK]] / [[cosineNearDupPairs]]: random-hyperplane LSH (sign
 *    sketches) — signatures over seeded pseudo-random hyperplanes
 *    (deterministic, xxhash64-derived components, no driver RNG). The
 *    shuffle key is (band, signature); bucket sizes bound the join.
 */
object Similarity {

  /** Cosine similarity of two array<float|double> columns (by name), in
    * double — the native fused-loop codegen kernel
    * ([[graft.functions.CosineSimilarity]]); bit-identical to [[cosineSql]]
    * on well-formed vectors (asserted in `VectorExpressionsSpec`), ~one
    * order of magnitude faster per pair on the brute-force path. */
  def cosine(ea: String, eb: String): Column =
    graft.functions.VectorExpressions.cosineSim(ea, eb)

  /** The composed-builtins form [[cosine]] replaced (zip_with + aggregate
    * folds in index order). Kept as the executable spec of the kernel's
    * numeric contract and for the bit-exactness test. */
  def cosineSql(ea: String, eb: String): Column = {
    val dot = expr(
      s"aggregate(zip_with($ea, $eb, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0.0 as double), (s, v) -> s + v)")
    def norm(e: String) = expr(
      s"sqrt(aggregate($e, cast(0.0 as double), (s, v) -> s + cast(v as double) * cast(v as double)))")
    dot / (norm(ea) * norm(eb))
  }

  /** Portable hyperplane component (b, bit, i) as integer SQL both Spark
    * and DuckDB evaluate identically: an LCG over the mixed index, mapped
    * to [-1, 1) at 1e-6 resolution. Exposed so the oracle can inline the
    * identical formula. */
  def portablePlaneSql(seed: Long): String =
    s"(cast((((${seed}L + cast(b as bigint) * 73856093L + cast(bit as bigint) * 19349663L " +
      s"+ cast(i as bigint) * 83492791L) % 1000000007L) " +
      s"* 1103515245L + 12345L) % 1000000007L % 2000001L as double) / 1000000.0 - 1.0)"

  /** SQL for a `bits`-bit random-hyperplane sign signature of `vecCol`,
    * parameterized by a lambda-bound band variable `b`. Hyperplane
    * component (b, bit, i) = hash-uniform value in [-1, 1) —
    * xxhash64-derived by default, the portable LCG family when the
    * signature must be oracle-replayable. */
  private def planeSigSql(vecCol: String, bits: Int, seed: Long, portable: Boolean): String = {
    val comp =
      if (portable) portablePlaneSql(seed)
      else s"(cast(pmod(xxhash64($seed, b, bit, i), 2000001) as double) / 1000000.0 - 1.0)"
    s"""aggregate(sequence(0, ${bits - 1}), cast(0 as bigint),
       |  (acc, bit) -> acc + CASE WHEN
       |    aggregate(zip_with($vecCol, sequence(0, size($vecCol) - 1),
       |        (v, i) -> cast(v as double) * $comp),
       |      cast(0.0 as double), (s, v) -> s + v) > 0
       |    THEN shiftleft(cast(1 as bigint), bit) ELSE cast(0 as bigint) END)""".stripMargin
  }

  /** The composed-builtins banded-signature column the native kernel
    * replaced — executable spec for `HashExpressionsSpec`. */
  private[graft] def bandedSigSql(
      vecCol: String,
      bands: Int,
      bits: Int,
      seed: Long,
      portable: Boolean): Column =
    explode(
      expr(s"transform(sequence(0, ${bands - 1}), b -> named_struct('band', b, 'sig', " +
        planeSigSql(vecCol, bits, seed, portable) + "))"))

  /** Adds (band, sig) rows per input row: band exploded from
    * sequence(0, bands-1), sig from the native
    * [[graft.functions.PlaneSignature]] kernel (bit-identical to
    * [[bandedSigSql]]; one fused loop instead of a bits × dim interpreted
    * lambda pyramid per band). */
  private def withBandedSig(
      df: DataFrame,
      vecCol: String,
      bands: Int,
      bits: Int,
      seed: Long,
      portable: Boolean): DataFrame =
    df.withColumn("band", explode(expr(s"sequence(0, ${bands - 1})")))
      .withColumn(
        "sig",
        graft.functions.HashExpressions.planeSig(col(vecCol), col("band"), bits, seed, portable))

  /**
   * Exact top-k cosine neighbours for each query vector.
   * @param corpus  (idCol, vecCol)
   * @param queries (idCol, vecCol) — should be small; it is broadcast
   * @return (query_id, neighbor_id, cos, rank) with rank ≤ k per query
   */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c
      .crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine("qv", "cv").as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(col("cos"), 6).as("cos"),
        col("rank").cast("long").as("rank"))
  }

  /**
   * LSH-bucketed approximate top-k: `bands` independent signatures of
   * `bitsPerBand` random-hyperplane bits; candidates = corpus sharing a
   * band signature with the query; exact cosine re-ranks candidates.
   */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      bands: Int = 4,
      bitsPerBand: Int = 8,
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    def signed(df: DataFrame, side: String): DataFrame =
      withBandedSig(
        df.select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_v")),
        s"${side}_v", bands, bitsPerBand, seed, portable)

    val c = signed(corpus, "neighbor")
    val q = broadcast(signed(queries, "query"))
    val cands = c
      .join(q, Seq("band", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("query_v"), col("neighbor_v"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .select(col("query_id"), col("neighbor_id"), cosine("query_v", "neighbor_v").as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(col("cos"), 6).as("cos"),
        col("rank").cast("long").as("rank"))
  }

  private def sizedSignatures(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bands: Int,
      bitsPerBand: Int,
      seed: Long,
      portable: Boolean = false): DataFrame =
    withBandedSig(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")),
      "v", bands, bitsPerBand, seed, portable)
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "sig")))

  /** Guardrail accounting for [[cosineNearDupPairs]]: the (band, sig,
    * bucket_n) buckets the cap would drop — observable, never silent. */
  def cosineNearDupDropped(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      bands: Int = 4,
      bitsPerBand: Int = 8,
      seed: Long = 42L,
      maxBucket: Int = 100000): DataFrame =
    sizedSignatures(corpus, idCol, vecCol, bands, bitsPerBand, seed)
      .filter(col("bucket_n") > maxBucket)
      .groupBy("band", "sig")
      .agg(first("bucket_n").as("bucket_n"))

  /** Embedding-cosine near-duplicate pairs over the whole corpus via LSH
    * buckets: pairs sharing any band signature with cosine ≥ threshold.
    * Buckets above `maxBucket` are dropped (the per-bucket self-join is
    * quadratic); [[cosineNearDupDropped]] reports exactly what was cut. */
  def cosineNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      bands: Int = 4,
      bitsPerBand: Int = 8,
      seed: Long = 42L,
      maxBucket: Int = 100000,
      portable: Boolean = false): DataFrame = {
    val sig = sizedSignatures(corpus, idCol, vecCol, bands, bitsPerBand, seed, portable)
      .filter(col("bucket_n") <= maxBucket)
    val l = sig.select(col("band"), col("sig"), col("id").as("a"), col("v").as("va"))
    val r = sig.select(col("band"), col("sig"), col("id").as("b"), col("v").as("vb"))
    l.join(r, Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("va"), col("vb"))
      .distinct()
      .select(col("a"), col("b"), round(cosine("va", "vb"), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /**
   * IVF-style approximate nearest neighbours (inverted file with sampled
   * pivots): the coarse quantizer is `nCells` pivot vectors chosen
   * deterministically (the corpus rows with the smallest id-hash — a
   * seedable sample, no training iterations so the whole pipeline is
   * replayable); every corpus vector is assigned to its nearest pivot's
   * cell; a query probes only its `nProbe` nearest cells and exact-reranks
   * those cells' members.
   *
   * The 100 TB shape: pivots are one broadcast (nCells rows); assignment is
   * a map-side argmax over the broadcast pivots folded by a partial
   * aggregate (the shuffle carries one row per corpus vector, not
   * nCells — `max(struct(cos, −prank))` keeps the combine associative with
   * the deterministic smallest-prank tie-break); the probe reads
   * ~nProbe/nCells of the corpus instead of all of it. Recall/latency
   * trade-off is (nCells, nProbe), exactly IVF-Flat's.
   *
   * @return (query_id, neighbor_id, cos, rank) with rank ≤ k per query
   */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nCells: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    // deterministic pivot sample: nCells smallest (hash, id); the portable
    // family is an LCG over the id (pure integer SQL DuckDB replays
    // verbatim), the default is xxhash64
    val pivotHash =
      if (portable) expr(s"(pmod($idCol, 1000000007L) * 1103515245L + 12345L) % 1000000007L")
      else xxhash64(lit(seed), col(idCol))
    val sampled = corpus
      .select(col(idCol).as("pid"), col(vecCol).as("pv"), pivotHash.as("h"))
      .orderBy(col("h"), col("pid"))
      .limit(nCells)
    val pivots = broadcast(
      sampled
        .withColumn("prank", row_number().over(Window.orderBy(col("h"), col("pid"))))
        .drop("h"))
    // ^ the global-order window runs on nCells rows only (post-limit)
    ivfSearch(corpus, queries, k, idCol, vecCol, pivots, nProbe)
  }

  /** The production-recall IVF path the sampled-pivot docs promise: the
    * identical joins as [[ivfTopK]], with the coarse quantizer a TRAINED
    * centroid table — [[Clustering.kmeans]]'s output plugs in directly.
    * Same 100 TB shape (the k centroids are one broadcast); still fully
    * oracle-replayable because the trainer is. */
  def ivfTopKTrained(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      centroids: Array[(Int, Array[Double])],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nProbe: Int = 4): DataFrame = {
    require(centroids.nonEmpty, "ivfTopKTrained needs at least one centroid")
    val session = corpus.sparkSession
    import session.implicits._
    val pivots = broadcast(
      centroids.toSeq.map { case (r, cv) => (r, cv.toSeq) }.toDF("prank", "pv"))
    ivfSearch(corpus, queries, k, idCol, vecCol, pivots, nProbe)
  }

  /** Shared IVF core over a broadcast pivot frame (prank, pv). */
  private def ivfSearch(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String,
      vecCol: String,
      pivots: DataFrame,
      nProbe: Int): DataFrame = {
    // cell assignment: argmax cosine over the broadcast pivots; the struct
    // max is ties-deterministic (higher cos, then smaller prank) and
    // partial-aggregates map-side, so the exchange carries |corpus| rows
    val assigned = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .crossJoin(pivots)
      .select(
        col("cid"), col("cv"),
        struct(cosine("cv", "pv").as("pcos"), (-col("prank")).as("nrank")).as("cand"))
      .groupBy("cid")
      .agg(first(col("cv")).as("cv"), max(col("cand")).as("best"))
      .select(col("cid"), col("cv"), (-col("best.nrank")).as("cell"))

    // probe: each query's nProbe nearest cells
    val qw = Window.partitionBy("query_id").orderBy(col("pcos").desc, col("prank"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(pivots)
      .select(col("query_id"), col("qv"), col("prank"), cosine("qv", "pv").as("pcos"))
      .withColumn("qrn", row_number().over(qw))
      .filter(col("qrn") <= nProbe)
      .select(col("query_id"), col("qv"), col("prank").as("cell"))

    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("cid"))
      .select(col("query_id"), col("cid").as("neighbor_id"), cosine("qv", "cv").as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(col("cos"), 6).as("cos"),
        col("rank").cast("long").as("rank"))
  }

  /**
   * Product-quantization ANN (Jégou et al., "Product Quantization for
   * Nearest Neighbor Search", TPAMI 2011): vectors are split into `m`
   * subspaces, each subspace quantized to the nearest of `kCodes`
   * codewords (L2); a query computes one additive distance table per
   * subspace (ADC) and scans only compact codes — `m` small ints per
   * vector instead of the full embedding — then exact-reranks the
   * `shortlist` best candidates by true cosine.
   *
   * Codewords are the subvectors of `kCodes` deterministically-sampled
   * corpus rows (the same portable id-hash sample as [[ivfTopK]]'s
   * pivots — no k-means training loop, so the whole pipeline is
   * oracle-replayable; plug a trained codebook into the same joins for
   * production recall).
   *
   * The 100 TB shape: the codebook is one broadcast (kCodes rows); the
   * encode pass partial-aggregates map-side (shuffle carries one row per
   * vector); the ADC scan is `m` broadcast hash joins over the code
   * columns plus a fixed-order `d_0 + … + d_{m−1}` sum (kept as singleton
   * conditional columns, NOT a float groupBy sum, so the addition order —
   * and hence the replay — is deterministic).
   *
   * @return (query_id, neighbor_id, cos, rank) with rank ≤ k per query
   */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 4,
      kCodes: Int = 16,
      shortlist: Int = 50,
      seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    val codeHash =
      if (portable) expr(s"(pmod($idCol, 1000000007L) * 1103515245L + 12345L) % 1000000007L")
      else xxhash64(lit(seed), col(idCol))
    val codebook = broadcast(
      corpus
        .select(col(idCol).as("code_id"), col(vecCol).as("codev"), codeHash.as("h"))
        .orderBy(col("h"), col("code_id"))
        .limit(kCodes)
        .withColumn("crank", row_number().over(Window.orderBy(col("h"), col("code_id"))))
        .drop("h"))
    // ^ the global-order window runs on kCodes rows only (post-limit)

    /** Per-subspace squared L2 distances between `a` and `b` as an
      * array<double> of length m (sub = dim/m consecutive components
      * each; fixed-order left fold per subspace). */
    def subDists(a: String, b: String): Column = expr(
      s"transform(sequence(0, ${m - 1}), j -> aggregate(" +
        s"zip_with(slice($a, j * (size($a) div $m) + 1, size($a) div $m), " +
        s"slice($b, j * (size($a) div $m) + 1, size($a) div $m), " +
        "(x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), " +
        "cast(0.0 as double), (s, v) -> s + v))")

    // encode: per corpus vector, per subspace, the argmin codeword; the
    // min(struct(dist, crank)) aggregates partial map-side and breaks
    // ties on the smaller code rank
    val encDists = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .crossJoin(codebook)
      .select(col("cid"), col("crank"), subDists("cv", "codev").as("ds"))
    val codeCols = (0 until m).map(j =>
      min(struct(col("ds").getItem(j).as("d"), col("crank").as("r")))
        .getField("r").as(s"code_$j"))
    val codes = encDists
      .groupBy("cid")
      .agg(codeCols.head, codeCols.tail: _*)

    // query distance tables (ADC): per query × codeword, the m sub-dists
    val dtab = broadcast(
      queries
        .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .crossJoin(codebook)
        .select(col("query_id"), col("qv"), col("crank"), subDists("qv", "codev").as("ds")))

    // ADC scan: m broadcast lookups, one per code column; the approximate
    // distance is the fixed-order sum of the m singleton columns
    val scanned = (0 until m).foldLeft(codes) { (acc, j) =>
      val lut = broadcast(dtab.select(
        col("query_id"),
        col("crank").as(s"code_$j"),
        col("ds").getItem(j).as(s"d_$j")))
      // the first lookup fans each corpus row out to the |queries| side;
      // the rest join on (query_id, code_j)
      acc.join(lut, if (j == 0) Seq(s"code_$j") else Seq("query_id", s"code_$j"))
    }
    val approx = scanned
      .withColumn("approx_dist", (0 until m).map(j => col(s"d_$j")).reduce(_ + _))
    val sw = Window.partitionBy("query_id").orderBy(col("approx_dist"), col("cid"))
    val short = approx
      .filter(col("query_id") =!= col("cid"))
      .withColumn("srn", row_number().over(sw))
      .filter(col("srn") <= shortlist)
      .select(col("query_id"), col("cid"))

    // exact rerank of the shortlist
    rerankShortlist(short, corpus, queries, k, idCol, vecCol)
  }

  /** Exact cosine rerank of a (query_id, cid) shortlist → top-k rows. */
  private def rerankShortlist(
      short: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String,
      vecCol: String): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    short
      .join(corpus.select(col(idCol).as("cid"), col(vecCol).as("cv")), Seq("cid"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))), Seq("query_id"))
      .select(col("query_id"), col("cid").as("neighbor_id"), cosine("qv", "cv").as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(col("cos"), 6).as("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** Canonical PQ training (Jégou 2011 §III): an INDEPENDENT k-means per
    * subspace over the corpus subvector slices — m small [[Clustering]]
    * runs, each with the bounded k×subdim collects. Returns the trained
    * per-subspace codebooks for [[pqTopKTrained]]. */
  def trainPqCodebooks(
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      m: Int = 4,
      kCodes: Int = 16,
      rounds: Int = 2,
      portable: Boolean = false,
      seed: Long = 42L): Seq[(Int, Array[(Int, Array[Double])])] =
    (0 until m).map { j =>
      val sub = corpus.select(
        col(idCol),
        expr(s"slice($vecCol, $j * (size($vecCol) div $m) + 1, size($vecCol) div $m)")
          .as("__sub"))
      j -> Clustering
        .kmeans(sub, idCol, "__sub", kCodes, rounds, seed = seed, portable = portable)
        .centroids
    }

  /** PQ ANN over TRAINED per-subspace codebooks ([[trainPqCodebooks]]) —
    * canonical product quantization, vs [[pqTopK]]'s zero-training sampled
    * stand-in. Each subspace encodes against its OWN codewords; the joins
    * keep the sampled variant's 100 TB shape (one broadcast of m×kCodes
    * rows, map-side argmin encode with partial aggregation, ADC as m
    * broadcast lookups with a fixed-order sum, exact rerank). Sub-distances
    * are rounded to 6 dp (the [[Clustering]] determinism contract) so the
    * whole pipeline replays in DuckDB. */
  def pqTopKTrained(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      codebooks: Seq[(Int, Array[(Int, Array[Double])])],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      shortlist: Int = 50): DataFrame = {
    val m = codebooks.size
    require(m >= 1, "pqTopKTrained needs at least one subspace codebook")
    val session = corpus.sparkSession
    import session.implicits._
    val combined = broadcast(
      codebooks.flatMap { case (j, cents) =>
        cents.map { case (r, cw) => (j, r, cw.toSeq) }
      }.toDF("j", "crank", "cw"))

    /** 6dp-rounded squared L2 between subvector j of `v` and the joined
      * codeword column `cw` (fixed-order left fold). */
    def subDistSql(v: String): Column = expr(
      s"round(aggregate(zip_with(slice($v, j * (size($v) div $m) + 1, size($v) div $m), cw, " +
        "(x, c) -> (cast(x as double) - c) * (cast(x as double) - c)), " +
        "cast(0.0 as double), (s, v) -> s + v), 6)")

    // encode: per (vector, subspace) the argmin codeword of THAT subspace;
    // min(when(j = …)) skips the other subspaces' rows and aggregates
    // partial map-side
    val enc = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .crossJoin(combined)
      .select(col("cid"), col("j"), col("crank"), subDistSql("cv").as("d"))
    val codeCols = (0 until m).map(j =>
      min(when(col("j") === j, struct(col("d"), col("crank"))))
        .getField("crank").as(s"code_$j"))
    val codes = enc.groupBy("cid").agg(codeCols.head, codeCols.tail: _*)

    // query distance tables per subspace (ADC)
    val dtab = broadcast(
      queries
        .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .crossJoin(combined)
        .select(col("query_id"), col("j"), col("crank"), subDistSql("qv").as("d")))
    val scanned = (0 until m).foldLeft(codes) { (acc, j) =>
      val lut = broadcast(dtab
        .filter(col("j") === j)
        .select(col("query_id"), col("crank").as(s"code_$j"), col("d").as(s"d_$j")))
      acc.join(lut, if (j == 0) Seq(s"code_$j") else Seq("query_id", s"code_$j"))
    }
    val approx = scanned
      .withColumn("approx_dist", (0 until m).map(j => col(s"d_$j")).reduce(_ + _))
    val sw = Window.partitionBy("query_id").orderBy(col("approx_dist"), col("cid"))
    val short = approx
      .filter(col("query_id") =!= col("cid"))
      .withColumn("srn", row_number().over(sw))
      .filter(col("srn") <= shortlist)
      .select(col("query_id"), col("cid"))
    rerankShortlist(short, corpus, queries, k, idCol, vecCol)
  }
}
