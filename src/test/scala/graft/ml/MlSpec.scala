package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup
    (4L, "completely different content about spark catalyst optimizer rules and codegen"),
    (5L, "Der Hund und die Katze sind gute Freunde und das ist schön"),
    (6L, "THE QUICK BROWN FOX jumps over the lazy dog near the river bank today!")) // case/punct variant
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val groups = Dedup.exact(docs).collect()
    val dupGroup = groups.find(_.getAs[Long]("n_dups") == 2L)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getAs[Long]("canonical_id") == 1L)
    assert(dupGroup.get.getSeq[Long](dupGroup.get.fieldIndex("doc_ids")).toList == List(1L, 2L))
  }

  test("normalized dedup also catches case/punctuation variants") {
    val groups = Dedup.normalized(docs).collect()
    val big = groups.map(_.getAs[Long]("n_dups")).max
    assert(big == 3L) // docs 1, 2, 6
  }

  test("minhash LSH surfaces the near-duplicate pair") {
    val pairs = Dedup
      .minHashLsh(docs, numHashes = 32, bands = 16, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), s"near dup pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc must not pair")
  }

  test("simhash hamming distance separates near-dups from distinct docs") {
    val pairs = Dedup
      .simHashPairs(docs, maxHamming = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard: exact dup = 1.0, near dup high, distinct low") {
    val cand = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val j = Dedup
      .ngramJaccard(docs, cand)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.5 && j((1L, 3L)) < 1.0)
    assert(j((1L, 4L)) == 0.0)
  }

  test("brute-force cosine top-k is exact and LSH recalls the top hit") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(vecs, queries, k = 5)
    val rows = brute.collect()
    assert(rows.length == 15) // 3 queries × 5
    // scores sorted descending within each query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    val lsh = Similarity
      .lshTopK(vecs, queries, k = 5, bands = 8, bitsPerBand = 4)
      .collect()
    assert(lsh.nonEmpty, "LSH should produce candidates at 8 bands x 4 bits")
    // every LSH result's cosine must equal the exact cosine (re-ranked)
    val bruteMap = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteMap.get(key).foreach(exact => assert(math.abs(exact - r.getDouble(2)) < 1e-9))
    }
  }

  test("dup clusters: components over pair graph, longest-text representative") {
    import spark.implicits._
    // pairs chain 1–2 and 2–3 into one cluster; 4 pairs with nobody
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Dedup.dupClusters(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Long]("cluster_n"), r.getAs[Boolean]("keep"))))
      .toMap
    // cluster = min member id; doc 3 is the longest text ("yesterday") → keep
    assert(out(1L) == ((1L, 3L, false)))
    assert(out(2L) == ((1L, 3L, false)))
    assert(out(3L) == ((1L, 3L, true)))
    // singletons cluster to themselves and are kept
    assert(out(4L) == ((4L, 1L, true)))
    assert(out(5L) == ((5L, 1L, true)))
    assert(out(6L) == ((6L, 1L, true)))
  }

  test("IVF top-k: probed-cell results carry exact cosines; full probe = brute force") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(vecs, queries, k = 5).collect()
    val bruteMap = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val ivf = Similarity.ivfTopK(vecs, queries, k = 5, nCells = 8, nProbe = 2).collect()
    assert(ivf.nonEmpty, "IVF must produce candidates at 8 cells / 2 probes")
    // every IVF hit's cosine is the exact cosine (re-rank is exact)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteMap.get(key).foreach(exact => assert(math.abs(exact - r.getDouble(2)) < 1e-9))
    }

    // probing ALL cells degenerates to exact brute-force top-k
    val full = Similarity.ivfTopK(vecs, queries, k = 5, nCells = 8, nProbe = 8).collect()
    assert(full.length == brute.length)
    val fullSet = full.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(fullSet == bruteSet, "nProbe = nCells must equal brute force")
  }

  test("IVF over trained k-means centroids: exact rerank; full probe = brute force") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(vecs, queries, k = 5).collect()
    val bruteMap = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val km = Clustering.kmeans(vecs, k = 8, assignRounds = 2)
    val ivf = Similarity.ivfTopKTrained(
      vecs, queries, k = 5, centroids = km.centroids, nProbe = 2).collect()
    assert(ivf.nonEmpty, "trained IVF must produce candidates at 8 cells / 2 probes")
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteMap.get(key).foreach(exact => assert(math.abs(exact - r.getDouble(2)) < 1e-9))
    }

    // probing ALL trained cells degenerates to exact brute-force top-k
    val full = Similarity.ivfTopKTrained(
      vecs, queries, k = 5, centroids = km.centroids, nProbe = 8).collect()
    val fullSet = full.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(fullSet == bruteSet, "nProbe = k must equal brute force")
  }

  test("PQ over per-subspace trained codebooks: exact rerank; full shortlist = brute force") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(vecs, queries, k = 5).collect()
    val bruteMap = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val cb = Similarity.trainPqCodebooks(vecs, m = 4, kCodes = 8, rounds = 2)
    assert(cb.size == 4 && cb.forall(_._2.length == 8))
    // subspace codebooks are genuinely independent (not slices of shared rows)
    assert(cb.map(_._2.map(_._2.toSeq).toSeq).distinct.size == 4)
    val pq = Similarity.pqTopKTrained(vecs, queries, k = 5, codebooks = cb, shortlist = 50)
      .collect()
    assert(pq.length == 15, "3 queries x 5 with shortlist 50 over 500 vectors")
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteMap.get(key).foreach(exact => assert(math.abs(exact - r.getDouble(2)) < 1e-9))
    }

    val full = Similarity.pqTopKTrained(
      vecs, queries, k = 5, codebooks = cb, shortlist = 1000000).collect()
    val fullSet = full.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(fullSet == bruteSet, "full shortlist must equal brute force")
  }

  test("PQ top-k: ADC shortlist carries exact rerank cosines; full shortlist = brute force") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(vecs, queries, k = 5).collect()
    val bruteMap = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val pq = Similarity.pqTopK(vecs, queries, k = 5, m = 4, kCodes = 8, shortlist = 50).collect()
    assert(pq.length == 15, "3 queries × 5 with shortlist 50 over 500 vectors")
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteMap.get(key).foreach(exact => assert(math.abs(exact - r.getDouble(2)) < 1e-9))
    }

    // shortlist covering the whole corpus degenerates to exact brute force
    val full = Similarity.pqTopK(vecs, queries, k = 5, m = 4, kCodes = 8, shortlist = 1000000).collect()
    val fullSet = full.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(fullSet == bruteSet, "shortlist = corpus must equal brute force")
  }

  test("repetition signals: duplicate lines and boilerplate n-grams") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "a b\na b\nc d"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(d).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    // doc 2: 3 lines, "a b" repeated → dup_line_frac 1/3; dup chars 3 of 11
    assert(math.abs(r(2L).getAs[Double]("dup_line_frac") - 0.333333) < 1e-9)
    assert(math.abs(r(2L).getAs[Double]("dup_line_char_frac") - 3.0 / 11).abs < 1e-5)
    // doc 1: five identical "spam spam" 2-grams (9 chars) over 29 chars
    assert(math.abs(r(1L).getAs[Double]("top_2gram_char_frac") - 45.0 / 29) < 1e-5)
    // doc 1: two identical 5-grams (24 chars each)
    assert(math.abs(r(1L).getAs[Double]("dup_5gram_char_frac") - 48.0 / 29) < 1e-5)
    // doc 3: nothing repeats
    assert(r(3L).getAs[Double]("dup_line_frac") == 0.0)
    assert(r(3L).getAs[Double]("dup_5gram_char_frac") == 0.0)
  }

  test("gopher signals: pass rule accepts prose, rejects bullet spam") {
    import spark.implicits._
    val prose = (Seq.fill(10)("the quick brown fox jumps over and over with that energy").mkString(" "))
    val bullets = (1 to 12).map(i => s"- bullet item number $i goes here with that and the").mkString("\n")
    val d = Seq((1L, prose), (2L, bullets)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherSignals(d).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r(1L).getAs[Long]("n_words") == 110L) // 11 words × 10 repeats
    assert(r(1L).getAs[Long]("stopword_hits") >= 2L)
    assert(r(1L).getAs[Boolean]("gopher_pass"), s"prose should pass: ${r(1L)}")
    assert(r(2L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(!r(2L).getAs[Boolean]("gopher_pass"), "bullet spam must fail")
  }

  test("c4 cleaning keeps punctuated >=5-word lines, drops junk") {
    import spark.implicits._
    val d = Seq((1L,
      "This is a good sentence with punctuation.\n" +
        "short line\n" +
        "bad javascript line here right today.\n" +
        "Another proper sentence appears right here.")).toDF("doc_id", "text")
    val r = TextAnalysis.c4Clean(d).collect().head
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Long]("n_kept") == 2L)
    val clean = r.getAs[String]("clean_text")
    assert(clean.startsWith("This is a good") && clean.endsWith("right here."))
    assert(!clean.contains("javascript") && !clean.contains("short line"))
  }

  test("guardrail drops are observable, not silent") {
    import spark.implicits._
    // 30 identical docs → every (band, bucket) is hot at maxBucket = 10
    val hot = (1 to 30).map(i => (i.toLong, "the same boilerplate text repeated again and again"))
      .toDF("doc_id", "text")
    val dropped = Dedup.minHashLshDropped(hot, maxBucket = 10).collect()
    assert(dropped.nonEmpty, "hot buckets must be reported")
    assert(dropped.forall(_.getAs[Long]("bucket_n") == 30L))
    val pairs = Dedup.minHashLsh(hot, maxBucket = 10)
    assert(pairs.count() == 0L, "capped buckets produce no pairs")
    // and with a generous cap nothing is dropped
    assert(Dedup.minHashLshDropped(hot, maxBucket = 1000).count() == 0L)

    // bipartite projection: a hub middle above the cap is reported
    val edges = (1L to 20L).map(p => (p, 100L, p)) // 20 primaries on middle 100
    val g = graft.graph.TemporalGraph.fromTriples(spark, edges)
    val prim = (1L to 20L).toDF("id")
    val droppedMid = graft.algos.BipartiteProjection
      .droppedMiddles(g, prim, maxPerMiddle = 5).collect()
    assert(droppedMid.map(_.getAs[Long]("middle")).toSeq == Seq(100L))
    assert(graft.algos.BipartiteProjection.run(g, prim, deltaMs = 100, maxPerMiddle = 5).count() == 0L)
  }

  test("text analysis signals") {
    val analyzed = TextAnalysis.analyze(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(analyzed(1L).getAs[Long]("n_tokens") == 14L)
    assert(analyzed(5L).getAs[String]("pred_lang") == "de")
    assert(analyzed(1L).getAs[String]("pred_lang") == "en")
    assert(analyzed(1L).getAs[String]("fingerprint") == analyzed(6L).getAs[String]("fingerprint"),
      "normalized fingerprint must collapse case/punct variants")
    val q = analyzed(1L).getAs[Double]("quality")
    assert(q > 0.5 && q <= 1.0)
  }

  test("multimodal: real ImageIO decode — golden feature vector for a known PNG") {
    // 2×1 image: pure red next to pure blue — every feature is hand-computable
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000)
    img.setRGB(1, 0, 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.ImageCodec.decodeFeatures(bos.toByteArray).get
    val lr = 0.299; val lb = 0.114 // luma of pure red / pure blue
    val meanL = (lr + lb) / 2
    val sdL = math.sqrt((lr * lr + lb * lb) / 2 - meanL * meanL)
    val want = Seq(2.0, 1.0, 2.0, 0.5, 0.0, 0.5, meanL, sdL)
    f.toSeq.zip(want).zipWithIndex.foreach { case ((got, w), i) =>
      assert(math.abs(got - w) < 1e-6, s"feature $i: got $got want $w")
    }
    // non-image bytes are rejected, not mis-decoded
    assert(Multimodal.ImageCodec.decodeFeatures("not a png".getBytes).isEmpty)
    assert(Multimodal.ImageCodec.decodeFeatures(Array.empty[Byte]).isEmpty)
  }

  test("multimodal: real javax.sound decode — golden feature vector for a known WAV") {
    // 8 frames of a square-ish hand-built signal at 1000 Hz mono: samples
    // alternate +16384 / -16384 (=±0.5), so rms = meanAbs = peak = 0.5 and
    // every adjacent pair crosses zero (7 crossings / 8 frames)
    val sr = 1000
    val data = new Array[Byte](16)
    for (i <- 0 until 8) {
      val s: Short = if (i % 2 == 0) 16384 else -16384
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 8L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val f = Multimodal.AudioCodec.decodeFeatures(bos.toByteArray).get
    val want = Seq(1000.0, 1.0, 8.0, 0.008, 0.5, 0.5, 7.0 / 8, 0.5)
    f.toSeq.zip(want).zipWithIndex.foreach { case ((got, w), i) =>
      assert(math.abs(got - w) < 1e-4, s"feature $i: got $got want $w")
    }
    // non-audio bytes are rejected, not mis-decoded
    assert(Multimodal.AudioCodec.decodeFeatures("not a wav".getBytes).isEmpty)
    assert(Multimodal.AudioCodec.decodeFeatures(Array.empty[Byte]).isEmpty)
  }

  test("multimodal: synthetic audio payloads are genuine WAVs that round-trip the decoder") {
    val assets = Multimodal.syntheticAssets(spark, 40).persist()
    val audio = assets.filter(col("modality") === "audio").collect()
    assert(audio.nonEmpty)
    audio.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      // RIFF/WAVE magic
      assert(new String(payload.take(4), "US-ASCII") == "RIFF")
      assert(new String(payload.slice(8, 12), "US-ASCII") == "WAVE")
      val meta = r.getStruct(r.fieldIndex("meta"))
      val f = Multimodal.AudioCodec.decodeFeatures(payload).get
      assert(f(0) == meta.getInt(2).toFloat, "decoded sample rate must match meta")
      val wantFrames = meta.getInt(2).toLong * meta.getLong(3) / 1000L
      assert(f(2) == wantFrames.toFloat, "decoded frame count must match meta duration")
      // a sine's rms ≈ amp/√2 with amp ∈ [0.2, 0.8] — a genuine decode
      // lands in (0.1, 0.6); the byte-hash fake could not
      assert(f(4) > 0.1f && f(4) < 0.6f, s"sine rms out of band: ${f(4)}")
    }
    // extractFeatures routes audio rows through the REAL kernel
    val feats = Multimodal.extractFeatures(spark, assets)
      .filter(col("modality") === "audio").collect()
    feats.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(f(0) == meta.getInt(2).toFloat)
    }
    assets.unpersist()
  }

  test("multimodal: synthetic image payloads are genuine PNGs that round-trip the decoder") {
    val assets = Multimodal.syntheticAssets(spark, 40).persist()
    val images = assets.filter(col("modality") === "image").collect()
    assert(images.nonEmpty)
    images.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      // PNG magic
      assert((payload(0) & 0xFF) == 0x89 && payload(1) == 'P'.toByte)
      val meta = r.getStruct(r.fieldIndex("meta"))
      val f = Multimodal.ImageCodec.decodeFeatures(payload).get
      assert(f(0) == meta.getInt(0).toFloat && f(1) == meta.getInt(1).toFloat,
        "decoded dims must match the metadata the PNG was synthesized from")
    }
    // extractFeatures routes image rows through the REAL kernel: features
    // lead with the true pixel dimensions
    val feats = Multimodal.extractFeatures(spark, assets)
      .filter(col("modality") === "image").collect()
    feats.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(f(0) == meta.getInt(0).toFloat && f(1) == meta.getInt(1).toFloat)
    }
    assets.unpersist()
  }

  test("multimodal: synthetic assets, stub features, frame/resize plans") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    assert(assets.count() == 30)
    val feats = Multimodal.extractFeatures(spark, assets)
    val row = feats.filter(col("payload").isNotNull).limit(1).collect()(0)
    assert(row.getSeq[Float](row.fieldIndex("features")).length == Multimodal.DecodeStub.featureDim)
    assert(row.getAs[Long]("n_bytes") > 0)
    // determinism of the stub path, invariant to the batch boundary
    val a = Multimodal.extractFeatures(spark, assets).orderBy("asset_id").collect()
    val b = Multimodal.extractFeatures(spark, assets).orderBy("asset_id").collect()
    assert(a.sameElements(b))
    val c = Multimodal.extractFeatures(spark, assets, batchSize = 7).orderBy("asset_id").collect()
    assert(a.sameElements(c), "results must not depend on batch size")
    val frames = Multimodal.sampleFramePlan(assets, everyMs = 10000, maxFrames = 5)
    assert(frames.groupBy("asset_id").count().agg(max("count")).first().getLong(0) <= 5)
    val resize = Multimodal.resizePlan(assets, 256, 256).collect()
    resize.foreach { r =>
      assert(r.getAs[Int]("target_width") <= 256 && r.getAs[Int]("target_height") <= 256)
    }
  }

  test("LM quality: reference-like text scores lower perplexity than alien text") {
    import spark.implicits._
    // 20 docs drawn from one phrase distribution form the in-plan reference
    // model; the gibberish doc uses characters/transitions the model has
    // barely seen, so its smoothed perplexity must be the highest
    val phrases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a stitch in time saves nine every single day",
      "all work and no play makes jack a dull boy")
    val docs = ((0 until 20).map(i => (i.toLong, phrases(i % 3))) :+
      (99L, "zqxj vvkk wwpq zzzz qjxz kkvv")).toDF("doc_id", "text")
    val out = TextAnalysis.lmQuality(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val (nGib, pGib) = out(99L)
    assert(nGib == "zqxj vvkk wwpq zzzz qjxz kkvv".length - 2)
    (0 until 20).foreach { i =>
      assert(out(i.toLong)._2 < pGib,
        s"doc $i perplexity ${out(i.toLong)._2} should beat gibberish $pGib")
    }
    // docs whose normalized text has no trigram are dropped, not scored
    val tiny = TextAnalysis.lmQuality(Seq((1L, "ab"), (2L, "abcd")).toDF("doc_id", "text"))
    assert(tiny.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("ngram census: counts, doc frequency, deterministic rank") {
    val corpus = Seq(
      (1L, "the cat THE cat sat"), // lowercased: the cat ×2 as a bigram
      (2L, "the  dog"), // double space → no empty token
      (3L, "solo")) // 1 token: no bigrams/trigrams
      .toDF("doc_id", "text")
    val rows = TextAnalysis.ngramCensus(corpus, topK = 100).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows((1L, "the")) == ((3L, 2L, 1L))) // 3 occurrences, 2 docs, top rank
    assert(rows((1L, "cat")) == ((2L, 1L, 2L)))
    assert(rows((2L, "the cat")) == ((2L, 1L, 1L)))
    assert(rows((2L, "cat the"))._1 == 1L && rows((2L, "the dog"))._1 == 1L)
    assert(rows((3L, "the cat the"))._1 == 1L && rows((3L, "cat the cat"))._1 == 1L)
    // ties rank by gram asc: all trigrams have count 1, so rank order = gram order
    val tri = rows.toSeq.collect { case ((3L, g), (_, _, rk)) => g -> rk }.sortBy(_._2)
    assert(tri.map(_._1) == tri.map(_._1).sorted, s"tie-break must be gram asc: $tri")
    assert(!rows.keys.exists(_._2 == "solo the") && !rows.keys.exists(_._2 == "dog solo"),
      "grams must never cross document boundaries")
    // topK boundary is deterministic and honored
    val top2 = TextAnalysis.ngramCensus(corpus, topK = 2).collect()
    assert(top2.count(_.getLong(0) == 1L) == 2 && top2.forall(_.getLong(4) <= 2L))
    // salting never changes the result
    val s1 = TextAnalysis.ngramCensus(corpus, saltBuckets = 1).collect().toSet
    val s64 = TextAnalysis.ngramCensus(corpus, saltBuckets = 64).collect().toSet
    assert(s1 == s64)
  }

  test("ngram order stats: totals, vocabulary, hapax") {
    val corpus = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    // unigrams: a×3 b×3 c×1 → total 7, distinct 3, hapax 1, max 3
    // bigrams: "a b"×3, "b a"×1, "b c"×1 → total 5, distinct 3, hapax 2, max 3
    // trigrams: "a b a","b a b","a b c" ×1 → total 3, distinct 3, hapax 3, max 1
    val st = TextAnalysis.ngramOrderStats(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(st(1L) == ((7L, 3L, 1L, 3L)))
    assert(st(2L) == ((5L, 3L, 2L, 3L)))
    assert(st(3L) == ((3L, 3L, 3L, 1L)))
  }
}
