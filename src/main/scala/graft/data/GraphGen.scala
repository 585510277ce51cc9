package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.TemporalGraph

/**
 * Seeded random-graph generators mirroring the reference's graphgen module
 * (raphtory/src/graphgen/erdos_renyi.rs:48, random_attachment.rs:51,
 * preferential_attachment.rs:55). All columnar and hash-seeded — identical
 * output at any parallelism, generated with `spark.range` + `xxhash64`, no
 * driver RNG.
 *
 * `randomAttachment` reproduces the shape of the reference's benchmark
 * graph (raphtory-benchmark/benches/algobench.rs:75-97: 500k nodes ×
 * 4 edges/step): node i attaches to `edgesPerStep` uniformly random
 * earlier nodes.
 */
object GraphGen {

  /** G(n, m)-style Erdős–Rényi: m edges with uniform endpoints. */
  def erdosRenyi(spark: SparkSession, n: Long, m: Long, seed: Long = 42L): TemporalGraph = {
    val edges = spark
      .range(m)
      .select(
        pmod(xxhash64(lit(seed), col("id"), lit("src")), lit(n)).as("src"),
        pmod(xxhash64(lit(seed), col("id"), lit("dst")), lit(n)).as("dst"),
        col("id").as("ts"))
      .withColumn("event_id", lit(0L))
      .withColumn("layer", lit("_default"))
    TemporalGraph(edges)
  }

  /** Random attachment: node i (i ≥ edgesPerStep) → `edgesPerStep` uniform
    * random nodes in [0, i). Matches the reference's bench generator
    * (graphgen/random_attachment.rs:51). */
  def randomAttachment(
      spark: SparkSession,
      nodes: Long,
      edgesPerStep: Int,
      seed: Long = 42L): TemporalGraph = {
    val k = edgesPerStep.toLong
    val edges = spark
      .range(k, nodes)
      .select(col("id").as("src"), explode(sequence(lit(0L), lit(k - 1))).as("e"))
      .select(
        col("src"),
        pmod(xxhash64(lit(seed), col("src"), col("e")), col("src")).as("dst"),
        col("src").as("ts"))
      .withColumn("event_id", col("dst"))
      .withColumn("layer", lit("_default"))
    TemporalGraph(edges)
  }

  /** Preferential-attachment approximation via the edge-copy trick: node i
    * attaches to a uniform random earlier node, and with probability 1/2
    * "copies" that node's own attachment target instead — yielding a
    * heavy-tailed degree distribution without sequential state (the
    * reference's generator, preferential_attachment.rs:55, is inherently
    * sequential; degree-weighted sampling ≈ following a random edge). */
  def preferentialAttachment(
      spark: SparkSession,
      nodes: Long,
      edgesPerStep: Int,
      seed: Long = 42L): TemporalGraph = {
    val k = edgesPerStep.toLong
    val base = spark
      .range(k, nodes)
      .select(col("id").as("src"), explode(sequence(lit(0L), lit(k - 1))).as("e"))
      .select(
        col("src"),
        col("e"),
        pmod(xxhash64(lit(seed), col("src"), col("e"), lit("u")), col("src")).as("u"),
        pmod(xxhash64(lit(seed), col("src"), col("e"), lit("flip")), lit(2L)).as("flip"))
    // copy step: if flip=1 and u itself has attachments (u >= k), follow
    // u's first attachment target; else keep u.
    val edges = base
      .select(
        col("src"),
        when(
          col("flip") === 1 && col("u") >= k,
          pmod(xxhash64(lit(seed), col("u"), lit(0L), lit("u")), col("u")))
          .otherwise(col("u"))
          .as("dst"),
        col("src").as("ts"))
      .withColumn("event_id", lit(0L))
      .withColumn("layer", lit("_default"))
    TemporalGraph(edges)
  }
}
