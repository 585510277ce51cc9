package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with a typed metadata struct, exactly as a 100 TB
 * multimodal corpus would store them next to text.
 *
 * The *decode* step (real image/audio decoding) is STUBBED — this container
 * has no codec libraries — behind [[DecodeStub]]: a deterministic fake that
 * derives "features" from the payload bytes. Everything around it is real
 * and tested: the schema contract, batch-shaped per-partition processing
 * via `mapPartitions` over Arrow-friendly rows (the Scala analog of a
 * `mapInPandas` batch UDF: same signature shape — an iterator of batches
 * in, an iterator of batches out), frame sampling, and resize bookkeeping.
 */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),   // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Deterministic synthetic asset table (payload bytes derived from the
    * asset id — no external data). */
  def syntheticAssets(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val modality = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(xxhash64(lit(seed), col("id")), lit(3)).cast("int") + 1))
    spark
      .range(n)
      .select(
        col("id").as("asset_id"),
        modality.as("modality"),
        // payload: 64 deterministic bytes from iterated hashing
        expr(s"cast(concat_ws('', transform(sequence(0, 7), i -> hex(xxhash64(id, i, $seed)))) as binary)")
          .as("payload"),
        struct(
          (pmod(xxhash64(lit(seed), col("id"), lit("w")), lit(1920)).cast("int") + 32).as("width"),
          (pmod(xxhash64(lit(seed), col("id"), lit("h")), lit(1080)).cast("int") + 32).as("height"),
          lit(16000).as("sample_rate"),
          (pmod(xxhash64(lit(seed), col("id"), lit("d")), lit(600000L)) + 1000L).as("duration_ms"),
          lit("synthetic").as("codec")).as("meta"))
  }

  /**
   * The stubbed decode kernel: real systems plug an image/audio codec here.
   * Deterministic: features are a fixed-length float vector derived from
   * payload bytes. Marked clearly as a stub.
   */
  object DecodeStub {
    val featureDim = 8

    /** STUB — the batch kernel boundary. Real systems decode a BATCH of
      * payloads per call (GPU codecs / model inference amortize per-call
      * overhead across the batch); the stub applies the per-payload fake
      * to each element so the batch plumbing is exercised end to end. */
    def decodeFeaturesBatch(payloads: Array[Array[Byte]]): Array[Array[Float]] =
      payloads.map(decodeFeatures)

    /** STUB — stands in for (decode → resize → feature-extract). */
    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      if (payload == null) return Array.fill(featureDim)(0f)
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      out.map(v => v / math.max(1, payload.length / featureDim))
    }
  }

  /**
   * Batch feature extraction: per-partition iterator processing in
   * `batchSize`-row batches (the `mapInPandas` batch-UDF shape: an
   * iterator of batches in, an iterator of batches out; at scale the
   * kernel is a codec/model batch call — here [[DecodeStub]]). Batches
   * materialize one at a time, so per-task memory is O(batchSize·payload),
   * not O(partition). Adds `features: array<float>` and `n_bytes: long`.
   */
  def extractFeatures(spark: SparkSession, assets: DataFrame, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0)
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType), nullable = true),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    assets.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val payloads = batch.iterator.map(_.getAs[Array[Byte]]("payload")).toArray
        val feats = DecodeStub.decodeFeaturesBatch(payloads)
        batch.iterator.zipWithIndex.map { case (r, i) =>
          val payload = payloads(i)
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq ++ Seq(feats(i).toSeq, if (payload == null) 0L else payload.length.toLong))
        }
      }
    }(enc)
  }

  /** Frame sampling plan for video assets: every `everyMs` ms up to
    * `maxFrames` — pure column math, one row per planned frame. */
  def sampleFramePlan(assets: DataFrame, everyMs: Long, maxFrames: Int): DataFrame =
    assets
      .filter(col("modality") === "video")
      .select(
        col("asset_id"),
        explode(
          slice(
            sequence(lit(0L), col("meta.duration_ms"), lit(everyMs)),
            1,
            maxFrames)).as("frame_ts_ms"))

  /** Resize bookkeeping: target box fit preserving aspect ratio (the
    * metadata half of a resize; pixel work lives in the decode stub). */
  def resizePlan(assets: DataFrame, maxW: Int, maxH: Int): DataFrame =
    assets
      .filter(col("modality") === "image")
      .select(
        col("asset_id"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        least(lit(1.0), least(lit(maxW) / col("meta.width"), lit(maxH) / col("meta.height")))
          .as("scale"))
      .select(
        col("asset_id"),
        col("width"),
        col("height"),
        round(col("width") * col("scale")).cast("int").as("target_width"),
        round(col("height") * col("scale")).cast("int").as("target_height"))
}
