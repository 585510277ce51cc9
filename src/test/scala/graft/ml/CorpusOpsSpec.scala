package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  private def docsDf = {
    val session = spark
    import session.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs today"),
      (3L, "the quick brown fox likes clean benchmarks a lot"),
      (4L, "completely unrelated text with no overlap at all here"))
      .toDF("doc_id", "text")
  }

  test("contamination counts shared n-grams against the benchmark") {
    val session = spark
    import session.implicits._
    val bench = Seq("x the quick brown fox y").toDF("text")
    val r = CorpusOps.contamination(docsDf, bench, n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // bench 4-grams: {x the quick brown, the quick brown fox, quick brown fox y}
    // doc 1 has 6 grams, 1 shared ("the quick brown fox"); doc 3 same; 2/4 none
    assert(r(1L) == (6L, 1L))
    assert(r(3L) == (6L, 1L))
    assert(r(2L)._2 == 0L && r(4L)._2 == 0L)
  }

  test("decontaminate drops exactly the overlapping docs; benchmark side broadcast") {
    val session = spark
    import session.implicits._
    val bench = Seq("x the quick brown fox y").toDF("text")
    val kept = CorpusOps.decontaminate(docsDf, bench, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
    val plan = CorpusOps.contamination(docsDf, bench, n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), "benchmark grams must broadcast, not shuffle the corpus")
  }

  test("dsirWeights ranks target-like docs above off-domain; integer, partition-invariant") {
    val session = spark
    import session.implicits._
    val corpus = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry apple banana"),
      (3L, "xylophone quartz zenith vortex"),
      (4L, "granite nebula quasar xylophone"))
      .toDF("doc_id", "text")
    val target = Seq((100L, "apple banana cherry apple")).toDF("doc_id", "text")
    val w = CorpusOps.dsirWeights(corpus, target, buckets = 512, portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L))
    // fruit docs score strictly above the off-domain docs
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)))
    // weights are a pure function of content: partitioning-invariant
    val w2 = CorpusOps.dsirWeights(corpus.repartition(5), target, buckets = 512, portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w2 == w)
    // the xxhash64 family agrees on the RANKING (different buckets)
    val wx = CorpusOps.dsirWeights(corpus, target, buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.min(wx(1L), wx(2L)) > math.max(wx(3L), wx(4L)))
    // top-k selection is the (weight desc, id) prefix with 1-based ranks
    val sel = CorpusOps.dsirSelect(corpus, target, k = 2, buckets = 512, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(sel.map(_._2) == Seq(1L, 2L))
    assert(sel.map(_._1).toSet == Set(1L, 2L))
    intercept[IllegalArgumentException](
      CorpusOps.dsirWeights(corpus, target, buckets = 0))
    intercept[IllegalArgumentException](
      CorpusOps.dsirWeights(corpus, target, ngramSizes = Seq.empty))
    // Gumbel resample: a pure function of (corpus, target, seed) — same
    // seed replays across partitionings, a new seed shifts the scores
    val r1 = CorpusOps.dsirResample(corpus, target, k = 4, seed = 1L,
      buckets = 512, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val r1b = CorpusOps.dsirResample(corpus.repartition(3), target, k = 4, seed = 1L,
      buckets = 512, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(r1 == r1b)
    val r2 = CorpusOps.dsirResample(corpus, target, k = 4, seed = 2L,
      buckets = 512, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(r1.map(_._2) != r2.map(_._2))
  }

  test("contaminationFuzzy flags near-dup leakage; benchmark side broadcast") {
    val session = spark
    import session.implicits._
    // benchmark doc 900 is an exact copy of corpus doc 1 → estimate 1.0
    val bench = Seq((900L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val r = CorpusOps.contaminationFuzzy(docsDf, bench, threshold = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toList
    assert(r.exists(t => t._1 == 1L && t._2 == 900L && t._3 == 1.0))
    assert(r.forall(_._3 >= 0.5))
    // one row per contaminated corpus doc
    assert(r.map(_._1).distinct.size == r.size)
    // the benchmark side broadcasts — the corpus is never shuffled on (band, bh)
    val plan = CorpusOps.contaminationFuzzy(docsDf, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"))
    intercept[IllegalArgumentException](
      CorpusOps.contaminationFuzzy(docsDf, bench, numHashes = 32, bands = 7))
  }

  test("quantileBuckets: exact global rank + buckets without a global sort; ties by id") {
    val session = spark
    import session.implicits._
    // 45 distinct values, each appearing twice → tie-breaks exercised
    val vals = (1 to 90).map(i => (i.toLong, (i % 45).toDouble))
    val df = vals.toDF("doc_id", "v")
    val expected = vals.sortBy { case (id, v) => (v, id) }.zipWithIndex
      .map { case ((id, v), i) => (id, v, i + 1L, i.toLong * 3 / 90 + 1L) }.toSet
    val got = CorpusOps.quantileBuckets(df, "v", nBuckets = 3, shards = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // exactness is partitioning-invariant (shard boundaries are only a
    // balance hint)
    val again = CorpusOps.quantileBuckets(df.repartition(7), "v", nBuckets = 3, shards = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    assert(again == expected)
    // single shard degenerates gracefully; empty input; loud validation
    assert(CorpusOps.quantileBuckets(df, "v", nBuckets = 3, shards = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet == expected)
    assert(CorpusOps.quantileBuckets(df.limit(0), "v", 3).count() == 0L)
    intercept[IllegalArgumentException](CorpusOps.quantileBuckets(df, "v", 0))
  }

  test("packSequences: chunks tile each doc and each sequence exactly") {
    val session = spark
    import session.implicits._
    // token counts: 3, 5, 2, 7 → global axis 0..17, seqLen 4
    val docs = Seq(
      (10L, "a b c"), (20L, "d e f g h"), (30L, "i j"), (40L, "k l m n o p q"))
      .toDF("doc_id", "text")
    val rows = CorpusOps.packSequences(docs, seqLen = 4, shards = 2)
      .orderBy("seq_id", "seq_off").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 10: [0,3) seq0@0; doc 20: [3,8) → seq0@3 len1, seq1@0 len4
    // doc 30: [8,10) seq2@0 len2; doc 40: [10,17) → seq2@2 len2, seq3 len4, seq4 len1
    assert(rows.toSeq == Seq(
      (10L, 0L, 0L, 0L, 3L), (20L, 0L, 3L, 0L, 1L),
      (20L, 1L, 0L, 1L, 4L),
      (30L, 2L, 0L, 0L, 2L), (40L, 2L, 2L, 0L, 2L),
      (40L, 3L, 0L, 2L, 4L),
      (40L, 4L, 0L, 6L, 1L)))
    // per-doc coverage: chunk lengths sum to the doc's token count
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._5).sum)
    assert(perDoc(10L) == 3L && perDoc(20L) == 5L && perDoc(30L) == 2L && perDoc(40L) == 7L)
    // every sequence except the last is exactly full
    val perSeq = rows.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert((0L to 3L).forall(perSeq(_) == 4L) && perSeq(4L) == 1L)
  }

  test("packSequences: shard count does not change the packing") {
    val session = spark
    import session.implicits._
    val docs = (0 until 200)
      .map(i => (i * 7L + 3, Seq.fill(i % 13 + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    def run(sh: Int) = CorpusOps.packSequences(docs, seqLen = 32, shards = sh)
      .orderBy("seq_id", "seq_off").collect().toSeq
    assert(run(1) == run(16))
    assert(run(16) == run(64))
  }

  test("packSequences: full-range xxhash64-scale ids (id span exceeds Long.MaxValue)") {
    val session = spark
    import session.implicits._
    // ids straddle the whole signed-Long range, so `hi - lo` wraps and a
    // raw `id - lo` raises under ANSI — the half-resolution bucketing must
    // keep the packing identical to the order-equivalent small-id corpus
    val big = Seq(
      (Long.MinValue + 13L, "a b c"), (-77L, "d e f g h"),
      (4242L, "i j"), (Long.MaxValue - 9L, "k l m n o p q"))
      .toDF("doc_id", "text")
    val rows = CorpusOps.packSequences(big, seqLen = 4, shards = 8)
      .orderBy("seq_id", "seq_off")
      .select("seq_id", "seq_off", "doc_off", "len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val small = CorpusOps.packSequences(
      Seq((10L, "a b c"), (20L, "d e f g h"), (30L, "i j"), (40L, "k l m n o p q"))
        .toDF("doc_id", "text"),
      seqLen = 4, shards = 8)
      .orderBy("seq_id", "seq_off")
      .select("seq_id", "seq_off", "doc_off", "len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == small.toSeq)
  }

  test("redaction replaces emails, IPs, phones, in that order") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, "write to john.doe+spam@example.co.uk today"),
      (2L, "server at 10.0.255.3 port open"),
      (3L, "call +1 555-0199 321 now"),
      (4L, "mixed: a@b.io via 1.2.3.4 tel (02) 9999-1234"),
      (5L, "clean text with no pii"))
      .toDF("doc_id", "text")
    val r = CorpusOps.redactionReport(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3), x.getLong(4), x.getString(5))).toMap
    assert(r(1L) == (1L, 0L, 0L, "write to <EMAIL> today"))
    assert(r(2L) == (0L, 1L, 0L, "server at <IP> port open"))
    assert(r(3L)._3 == 1L && r(3L)._4 == "call <PHONE> now")
    assert(r(4L) == (1L, 1L, 1L, "mixed: <EMAIL> via <IP> tel <PHONE>"))
    assert(r(5L) == (0L, 0L, 0L, "clean text with no pii"))
  }
}
