package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with a typed metadata struct, exactly as a 100 TB
 * multimodal corpus would store them next to text.
 *
 * The IMAGE decode path is REAL: the JDK's `javax.imageio` (PNG/JPEG/
 * BMP/GIF — no external dependency) decodes payload bytes inside the batch
 * kernel and emits dimensional + per-channel statistics as the feature
 * vector; [[syntheticAssets]] writes genuine deterministic PNG payloads so
 * the whole path round-trips real bytes under test. AUDIO/VIDEO decode
 * stays STUBBED behind [[DecodeStub]] (no audio/video codec libraries in
 * this container): a deterministic fake derives "features" from payload
 * bytes. Everything around the kernels is real and tested: the schema
 * contract, batch-shaped per-partition processing via `mapPartitions` over
 * Arrow-friendly rows (the Scala analog of a `mapInPandas` batch UDF: same
 * signature shape — an iterator of batches in, an iterator of batches
 * out), frame sampling, and resize bookkeeping.
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
    * asset id — no external data). IMAGE rows carry GENUINE PNG payloads
    * (encoded with the JDK's ImageIO inside the same batch boundary the
    * decode kernel uses — dimensions and pixels are pure functions of
    * (seed, id), so the table is identical on every run/partitioning);
    * audio/video rows keep opaque hash-derived bytes. */
  def syntheticAssets(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val modality = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(xxhash64(lit(seed), col("id")), lit(3)).cast("int") + 1))
    val base = spark
      .range(n)
      .select(
        col("id").as("asset_id"),
        modality.as("modality"),
        // non-image payload: 64 deterministic bytes from iterated hashing
        expr(s"cast(concat_ws('', transform(sequence(0, 7), i -> hex(xxhash64(id, i, $seed)))) as binary)")
          .as("payload"),
        struct(
          // image dims are kept small (4..19 px) so a synthetic table of
          // millions of rows stays payload-light; real corpora carry real
          // sizes — the decode kernel takes them from the bytes, not meta
          (pmod(xxhash64(lit(seed), col("id"), lit("w")), lit(16)).cast("int") + 4).as("width"),
          (pmod(xxhash64(lit(seed), col("id"), lit("h")), lit(16)).cast("int") + 4).as("height"),
          lit(16000).as("sample_rate"),
          (pmod(xxhash64(lit(seed), col("id"), lit("d")), lit(600000L)) + 1000L).as("duration_ms"),
          when(modality === "image", lit("png")).otherwise(lit("synthetic")).as("codec")).as("meta"))
    val schema = org.apache.spark.sql.types.StructType(base.schema.fields)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    base.mapPartitions { rows =>
      rows.map { r =>
        if (r.getString(1) == "image") {
          val meta = r.getStruct(3)
          val png = ImageCodec.deterministicPng(seed, r.getLong(0), meta.getInt(0), meta.getInt(1))
          // schema-carrying row: Spark pipelines consecutive mapPartitions
          // without a serialization round-trip, so downstream batch kernels
          // (extractFeatures) see THIS object and address fields by name
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array[Any](r.getLong(0), r.getString(1), png, meta), schema)
        } else r
      }
    }(enc)
  }

  /**
   * REAL image codec over the JDK's `javax.imageio` — zero external
   * dependencies. Encode side exists for deterministic synthesis/tests;
   * decode side is the production kernel for [[extractFeatures]].
   */
  object ImageCodec {

    /** Deterministic w×h RGB PNG: pixel (x, y) color = xxhash-free simple
      * LCG mix of (seed, id, x, y) — pure function, byte-identical across
      * runs and partitionings. */
    def deterministicPng(seed: Long, id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var m = seed * 6364136223846793005L + id * 1442695040888963407L +
            (x.toLong << 32) + y.toLong
          m ^= (m >>> 33); m *= -49064778989728563L; m ^= (m >>> 33)
          img.setRGB(x, y, (m & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode any ImageIO-supported payload (PNG/JPEG/BMP/GIF) to the
      * 8-dim feature vector: [width, height, aspect, meanR, meanG, meanB,
      * meanLuma, stddevLuma] (means/stddev in [0,1]). None when the bytes
      * are not a decodable image. */
    def decodeFeatures(payload: Array[Byte]): Option[Array[Float]] = {
      if (payload == null || payload.length == 0) return None
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = ((rgb >> 16) & 0xFF) / 255.0
          val g = ((rgb >> 8) & 0xFF) / 255.0
          val b = (rgb & 0xFF) / 255.0
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          x += 1
        }
        y += 1
      }
      val np = (w.toLong * h).toDouble
      val meanL = sl / np
      val varL = math.max(sl2 / np - meanL * meanL, 0.0)
      Some(Array(
        w.toFloat, h.toFloat, (w.toDouble / h).toFloat,
        (sr / np).toFloat, (sg / np).toFloat, (sb / np).toFloat,
        meanL.toFloat, math.sqrt(varL).toFloat))
    }
  }

  /**
   * The stubbed AUDIO/VIDEO decode kernel — this container has no
   * audio/video codec libraries, so real systems plug their codec here.
   * (The IMAGE kernel is real: [[ImageCodec.decodeFeatures]].)
   * Deterministic: features are a fixed-length float vector derived from
   * payload bytes. Marked clearly as a stub.
   */
  object DecodeStub {
    val featureDim = 8

    /** The batch kernel boundary. Real systems decode a BATCH of payloads
      * per call (GPU codecs / model inference amortize per-call overhead
      * across the batch); image payloads go through the REAL ImageIO
      * kernel, audio/video through the per-payload fake — both inside one
      * batch call so the plumbing is exercised end to end. */
    def decodeFeaturesBatch(
        modalities: Array[String],
        payloads: Array[Array[Byte]]): Array[Array[Float]] =
      payloads.zipWithIndex.map { case (p, i) =>
        if (modalities(i) == "image")
          // undecodable image bytes fall back to the deterministic fake
          // rather than nulling the row (corrupt-payload accounting happens
          // upstream where the corpus is curated)
          ImageCodec.decodeFeatures(p).getOrElse(decodeFeatures(p))
        else decodeFeatures(p)
      }

    /** STUB — stands in for (audio/video decode → resample → feature-extract). */
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
   * kernel is a codec/model batch call — REAL ImageIO decode for images,
   * [[DecodeStub]] for audio/video). Batches materialize one at a time,
   * so per-task memory is O(batchSize·payload), not O(partition). Adds
   * `features: array<float>` and `n_bytes: long`.
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
        val modalities = batch.iterator.map(_.getAs[String]("modality")).toArray
        val feats = DecodeStub.decodeFeaturesBatch(modalities, payloads)
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
