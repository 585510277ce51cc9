package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.TemporalGraph

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.util.Try

/**
 * Durable graph storage with Iceberg-style snapshot commits — the Spark
 * analog of the reference's persistence stack: GraphFolder snapshots
 * (raphtory/src/serialise/graph_folder.rs, serialise.rs:23-62), the parquet
 * encoder (raphtory/src/parquet_encoder/), and the WAL + control-file
 * replay path (db4-storage/src/wal/mod.rs:28, persist/control_file.rs).
 *
 * Layout under `root/`:
 * {{{
 *   log/batch=<k>/           appended edge-event parquet (the WAL analog)
 *   log/batch=<k>.json       per-batch commit manifest (rows, checksum)
 *   snapshots/<k>/edges/     compacted snapshot parquet, bucketed by src
 *   snapshots/<k>/manifest.json
 *   HEAD                     atomic pointer to the current snapshot id
 * }}}
 *
 * Writers commit data files first, then atomically rename the manifest /
 * HEAD pointer — readers only ever see fully-committed state (the same
 * commit protocol as the superstep runner's checkpoints). `read` = HEAD
 * snapshot + any committed log batches after it; `compact` folds the log
 * into a new snapshot. Time travel: `readSnapshot(k)` (the reference's
 * `snapshot_at` durability analog).
 */
final class GraphStore(val root: String, spark: SparkSession) {

  private def p(parts: String*) = Paths.get(root, parts: _*)

  // ---- event log (WAL analog) ----

  /** Append a batch of edge events; returns the batch id (LSN analog). */
  def append(edges: DataFrame): Long =
    appendAs(edges, committedBatches.lastOption.getOrElse(-1L) + 1)

  /**
   * Idempotent append under a caller-chosen batch id — the contract the
   * Structured Streaming sink needs: foreachBatch is at-least-once, so a
   * replayed micro-batch re-calls this with the SAME streaming batchId and
   * must be a no-op once the batch manifest is committed (data files land
   * first, manifest last — an interrupted write without a manifest is
   * invisible to readers and safely overwritten on retry).
   */
  def appendAs(edges: DataFrame, batchId: Long): Long = {
    if (committedBatches.contains(batchId)) return batchId
    Files.createDirectories(p("log"))
    val next = batchId
    val dir = p("log", s"batch=$next").toString
    edges.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val r = back
      .agg(count(lit(1)), expr("bit_xor(xxhash64(struct(*)))"))
      .first()
    val manifest =
      s"""{"batch":$next,"rows":${r.getLong(0)},"checksum":${if (r.isNullAt(1)) 0L else r.getLong(1)}}"""
    atomicWrite(p("log", s"batch=$next.json"), manifest)
    next
  }

  def committedBatches: Seq[Long] = {
    val log = p("log")
    if (!Files.isDirectory(log)) return Nil
    listDir(log)
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .flatMap(n => Try(n.stripPrefix("batch=").stripSuffix(".json").toLong).toOption)
      .sorted
  }

  // ---- snapshots ----

  def headSnapshot: Option[Long] =
    if (Files.exists(p("HEAD")))
      Try(new String(Files.readAllBytes(p("HEAD")), StandardCharsets.UTF_8).trim.toLong).toOption
    else None

  /** Compact HEAD + committed log into a new snapshot, bucketed by src so
    * downstream adjacency builds shuffle-align; advances HEAD atomically. */
  def compact(buckets: Int = 32): Long = {
    val df = read().edges
    val next = headSnapshot.getOrElse(-1L) + 1
    val dir = p("snapshots", next.toString, "edges").toString
    df.withColumn("bucket", pmod(xxhash64(col("src")), lit(buckets.toLong)))
      .repartition(buckets, col("bucket"))
      .write
      .mode("overwrite")
      .partitionBy("bucket")
      .parquet(dir)
    val back = spark.read.parquet(dir)
    val r = back.agg(count(lit(1))).first()
    val upTo = committedBatches.lastOption.getOrElse(-1L)
    atomicWrite(
      p("snapshots", next.toString, "manifest.json"),
      s"""{"snapshot":$next,"rows":${r.getLong(0)},"includesLogUpTo":$upTo,"buckets":$buckets}""")
    atomicWrite(p("HEAD"), next.toString)
    next
  }

  /** Current graph = HEAD snapshot + log batches committed after it. */
  def read(): TemporalGraph = {
    val snap = headSnapshot.flatMap { k =>
      val manifest = p("snapshots", k.toString, "manifest.json")
      if (Files.exists(manifest)) {
        val upTo = "\"includesLogUpTo\":(-?\\d+)".r
          .findFirstMatchIn(new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8))
          .map(_.group(1).toLong)
          .getOrElse(-1L)
        Some((spark.read.parquet(p("snapshots", k.toString, "edges").toString).drop("bucket"), upTo))
      } else None
    }
    val (base, upTo) = snap.getOrElse((emptyEdges, -1L))
    val tail = committedBatches.filter(_ > upTo)
    val df = tail.foldLeft(base) { (acc, b) =>
      acc.unionByName(spark.read.parquet(p("log", s"batch=$b").toString), allowMissingColumns = true)
    }
    TemporalGraph(df)
  }

  /** Time travel to a specific committed snapshot. */
  def readSnapshot(k: Long): TemporalGraph =
    TemporalGraph(spark.read.parquet(p("snapshots", k.toString, "edges").toString).drop("bucket"))

  private def emptyEdges: DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("src", LongType), StructField("dst", LongType),
        StructField("ts", LongType), StructField("event_id", LongType),
        StructField("layer", StringType))))
  }

  private def atomicWrite(path: java.nio.file.Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def listDir(dir: java.nio.file.Path): List[java.nio.file.Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toList
    } finally s.close()
  }
}
