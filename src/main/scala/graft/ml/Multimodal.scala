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
 * vector. The AUDIO decode path is REAL too: the JDK's
 * `javax.sound.sampled` (WAV/AIFF/AU PCM) decodes payload bytes to frames
 * and emits rate/duration/energy statistics. [[syntheticAssets]] writes
 * genuine deterministic PNG and WAV payloads so both paths round-trip
 * real bytes under test. Only VIDEO decode stays STUBBED behind
 * [[DecodeStub]] (the JDK ships no video codec): a deterministic fake
 * derives "features" from payload bytes. Everything around the kernels is
 * real and tested: the schema
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
    * and AUDIO rows GENUINE WAV payloads (encoded with the JDK's
    * ImageIO / javax.sound.sampled inside the same batch boundary the
    * decode kernels use — dimensions, pixels, and samples are pure
    * functions of (seed, id), so the table is identical on every
    * run/partitioning); video rows keep opaque hash-derived bytes. */
  def syntheticAssets(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val modality = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(xxhash64(lit(seed), col("id")), lit(3)).cast("int") + 1))
    val base = spark
      .range(n)
      .select(
        col("id").as("asset_id"),
        modality.as("modality"),
        // video payload: 64 deterministic bytes from iterated hashing
        // (image/audio rows overwrite this with real codec bytes below)
        expr(s"cast(concat_ws('', transform(sequence(0, 7), i -> hex(xxhash64(id, i, $seed)))) as binary)")
          .as("payload"),
        struct(
          // image dims are kept small (4..19 px) so a synthetic table of
          // millions of rows stays payload-light; real corpora carry real
          // sizes — the decode kernel takes them from the bytes, not meta
          (pmod(xxhash64(lit(seed), col("id"), lit("w")), lit(16)).cast("int") + 4).as("width"),
          (pmod(xxhash64(lit(seed), col("id"), lit("h")), lit(16)).cast("int") + 4).as("height"),
          lit(8000).as("sample_rate"),
          // audio clips stay short (50..249 ms) for the same payload-light
          // reason; video keeps long fake durations for the frame planner
          when(
            modality === "audio",
            pmod(xxhash64(lit(seed), col("id"), lit("d")), lit(200L)) + 50L)
            .otherwise(pmod(xxhash64(lit(seed), col("id"), lit("d")), lit(600000L)) + 1000L)
            .as("duration_ms"),
          when(modality === "image", lit("png"))
            .when(modality === "audio", lit("wav"))
            .otherwise(lit("synthetic")).as("codec")).as("meta"))
    val schema = org.apache.spark.sql.types.StructType(base.schema.fields)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val m = r.getString(1)
        if (m == "image" || m == "audio") {
          val meta = r.getStruct(3)
          val payload =
            if (m == "image")
              ImageCodec.deterministicPng(seed, r.getLong(0), meta.getInt(0), meta.getInt(1))
            else
              AudioCodec.deterministicWav(seed, r.getLong(0), meta.getInt(2), meta.getLong(3))
          // schema-carrying row: Spark pipelines consecutive mapPartitions
          // without a serialization round-trip, so downstream batch kernels
          // (extractFeatures) see THIS object and address fields by name
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array[Any](r.getLong(0), m, payload, meta), schema)
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
   * REAL audio codec over the JDK's `javax.sound.sampled` (WAV/AIFF/AU,
   * PCM) — zero external dependencies. Encode side exists for
   * deterministic synthesis/tests; decode side is the production kernel
   * for [[extractFeatures]].
   */
  object AudioCodec {

    /** Deterministic 16-bit PCM mono WAV: an id-keyed sine (frequency and
      * amplitude are pure functions of (seed, id); `StrictMath.sin` is
      * bit-exact across JVMs) — byte-identical across runs and
      * partitionings. */
    def deterministicWav(seed: Long, id: Long, sampleRate: Int, durationMs: Long): Array[Byte] = {
      var m = seed * 6364136223846793005L + id * 1442695040888963407L
      m ^= (m >>> 33); m *= -49064778989728563L; m ^= (m >>> 33)
      val freq = 200.0 + java.lang.Long.remainderUnsigned(m, 1800L)
      val amp = 0.2 + 0.6 * java.lang.Long.remainderUnsigned(m >>> 16, 1000L) / 1000.0
      val frames = (sampleRate * durationMs / 1000L).toInt.max(1)
      val data = new Array[Byte](frames * 2)
      var i = 0
      while (i < frames) {
        val v = amp * StrictMath.sin(2.0 * StrictMath.PI * freq * i / sampleRate)
        val s = math.round(v * 32767.0).toInt.toShort
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode any javax.sound-supported payload (WAV/AIFF/AU PCM) to the
      * 8-dim feature vector: [sample_rate, channels, frames, duration_sec,
      * rms, peak, zero_cross_rate, mean_abs] (amplitudes in [0,1], frames
      * mixed to mono for the statistics). None when the bytes are not a
      * decodable audio stream. */
    def decodeFeatures(payload: Array[Byte]): Option[Array[Float]] = {
      if (payload == null || payload.length == 0) return None
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException                               => null
        }
      if (in == null) return None
      try {
        val src = in.getFormat
        val pcm = new javax.sound.sampled.AudioFormat(
          src.getSampleRate, 16, src.getChannels, true, false)
        val s = javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, in)
        val bytes = s.readAllBytes()
        val ch = pcm.getChannels
        val frames = bytes.length / (2 * ch)
        if (frames == 0) return None
        var rms = 0.0; var peak = 0.0; var meanAbs = 0.0
        var zc = 0; var prev = 0.0
        var f = 0
        while (f < frames) {
          var mono = 0.0
          var c = 0
          while (c < ch) {
            val o = 2 * (f * ch + c)
            val v = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort / 32768.0
            mono += v
            c += 1
          }
          mono /= ch
          rms += mono * mono
          meanAbs += math.abs(mono)
          if (mono > peak) peak = mono
          if (-mono > peak) peak = -mono
          if (f > 0 && (mono > 0) != (prev > 0)) zc += 1
          prev = mono
          f += 1
        }
        Some(Array(
          pcm.getSampleRate, ch.toFloat, frames.toFloat,
          (frames / pcm.getSampleRate.toDouble).toFloat,
          math.sqrt(rms / frames).toFloat, peak.toFloat,
          (zc.toDouble / frames).toFloat, (meanAbs / frames).toFloat))
      } catch {
        case _: java.io.IOException                 => None
        case _: IllegalArgumentException            => None
      } finally in.close()
    }
  }

  /**
   * The stubbed VIDEO decode kernel — the JDK ships no video codec, so
   * real systems plug theirs here. (The IMAGE and AUDIO kernels are real:
   * [[ImageCodec.decodeFeatures]] / [[AudioCodec.decodeFeatures]].)
   * Deterministic: features are a fixed-length float vector derived from
   * payload bytes. Marked clearly as a stub.
   */
  object DecodeStub {
    val featureDim = 8

    /** The batch kernel boundary. Real systems decode a BATCH of payloads
      * per call (GPU codecs / model inference amortize per-call overhead
      * across the batch); image payloads go through the REAL ImageIO
      * kernel and audio payloads through the REAL javax.sound kernel,
      * video through the per-payload fake — all inside one batch call so
      * the plumbing is exercised end to end. */
    def decodeFeaturesBatch(
        modalities: Array[String],
        payloads: Array[Array[Byte]]): Array[Array[Float]] =
      payloads.zipWithIndex.map { case (p, i) =>
        // undecodable image/audio bytes fall back to the deterministic
        // fake rather than nulling the row (corrupt-payload accounting
        // happens upstream where the corpus is curated)
        modalities(i) match {
          case "image" => ImageCodec.decodeFeatures(p).getOrElse(decodeFeatures(p))
          case "audio" => AudioCodec.decodeFeatures(p).getOrElse(decodeFeatures(p))
          case _       => decodeFeatures(p)
        }
      }

    /** STUB — stands in for (video decode → frame-sample → feature-extract). */
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
   * REAL javax.sound decode for audio, [[DecodeStub]] for video).
   * Batches materialize one at a time,
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
