package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of exact duplicated-substring spans
  * ([[Dedup.duplicateSpans]]): window census → cross-doc duplicate hashes →
  * maximal consecutive-window span merge. */
class DuplicateSpansSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    Seq(
      (1L, s"x1 x2 $passage y1 y2"),
      (2L, s"z1 $passage w1"),
      (3L, "only unique tokens here nothing is shared with others"),
      (4L, "q1 q2 q3 q4 q1 q2 q3 q4"), // repeats only WITHIN one doc
      (5L, "tiny")
    ).toDF("doc_id", "text")
  }

  for (portable <- Seq(false, true)) {
    val fam = if (portable) "portable" else "xxhash64"
    test(s"planted cross-doc passage becomes one maximal span per doc ($fam)") {
      val out = Dedup.duplicateSpans(docs, minTokens = 4, minDocs = 2, portable = portable)
        .orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // the shared 8-token passage → 5 consecutive 4-token windows → one
      // span of 5 + 4 − 1 = 8 tokens; doc 3 shares nothing, doc 4's repeat
      // is within a single doc (minDocs counts DISTINCT docs), doc 5 is
      // shorter than a window
      assert(out.toSeq == Seq((1L, 2L, 8L, 5L), (2L, 1L, 8L, 5L)))
    }
  }

  test("internal-only repetition qualifies when minDocs = 1") {
    val out = Dedup.duplicateSpans(docs, minTokens = 4, minDocs = 1)
      .filter(col("doc_id") === 4L)
      .collect()
    // windows at pos 0 and pos 4 share a hash; they are NOT consecutive, so
    // they stay two one-window spans of 4 tokens
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq ==
      Seq((0L, 4L, 1L), (4L, 4L, 1L)))
  }

  for (portable <- Seq(false, true)) {
    val fam = if (portable) "portable" else "xxhash64"
    test(s"removeDuplicateSpans keeps the first occurrence, cuts the twin ($fam)") {
      val out = Dedup.removeDuplicateSpans(docs, minTokens = 4, minDocs = 2, portable = portable)
        .orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val passage = (1 to 8).map(i => s"p$i").mkString(" ")
      // doc 1 holds the canonical (smallest doc_id) copy; doc 2's copy is
      // cut; untouched docs come back token-normalized with 0 removals
      assert(out.toSeq == Seq(
        (1L, s"x1 x2 $passage y1 y2", 0L),
        (2L, "z1 w1", 8L),
        (3L, "only unique tokens here nothing is shared with others", 0L),
        (4L, "q1 q2 q3 q4 q1 q2 q3 q4", 0L),
        (5L, "tiny", 0L)))
    }
  }

  test("removeDuplicateSpans removal accounting matches span census on the real corpus") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val spans = Dedup.duplicateSpans(real, minTokens = 8, minDocs = 2)
    val cleaned = Dedup.removeDuplicateSpans(real, minTokens = 8, minDocs = 2)
    val removedTotal = cleaned.agg(sum("removed_tokens")).first().getLong(0)
    val spanTotal = spans.agg(sum("span_len")).first().getLong(0)
    // every duplicated span group keeps exactly one copy, so the removed
    // token count is strictly positive and strictly below the census total
    assert(removedTotal > 0L && removedTotal < spanTotal,
      s"removed=$removedTotal censusTotal=$spanTotal")
    assert(cleaned.count() == real.count())
  }

  test("random corpora match a text-based brute-force model (no hashing)") {
    import spark.implicits._
    // seeded generator: small vocab forces natural repeated windows
    def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
      var s = seed
      def nxt(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s & Long.MaxValue }
      (0 until nDocs).map { d =>
        val n = 6 + (nxt() % 20).toInt
        (d.toLong, (0 until n).map(_ => s"w${nxt() % 9}").mkString(" "))
      }
    }
    // brute-force model: window duplicated iff its exact token sequence
    // occurs ≥2 times and in ≥2 distinct docs; consecutive positions merge
    def model(docs: Seq[(Long, String)], w: Int): Seq[(Long, Long, Long, Long)] = {
      val wins = docs.flatMap { case (id, text) =>
        val tk = text.split("\\s+")
        (0 to tk.length - w).map(i => (tk.slice(i, i + w).mkString(" "), id, i))
      }
      val byWin = wins.groupBy(_._1)
      val dup = byWin.filter { case (_, v) =>
        v.size >= 2 && v.map(_._2).distinct.size >= 2
      }.values.flatten.map { case (_, id, p) => (id, p) }.toSet
      dup.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).toSeq.sorted
        val islands = sorted.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 => (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        islands.map(isl => (id, isl.min.toLong, (isl.size + w - 1).toLong, isl.size.toLong))
      }.sorted
    }
    for (seed <- Seq(7L, 99L, 12345L)) {
      val docs = corpus(seed, 12)
      val expected = model(docs, 4)
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), minTokens = 4, minDocs = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted
        .toSeq
      assert(got == expected, s"seed=$seed\n got=$got\n exp=$expected")
    }
  }

  test("real corpus: span arithmetic + non-overlap invariants, both families agree on shape") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.duplicateSpans(real, minTokens = 8, minDocs = 2)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty, "expected duplicated spans in the near-dup-seeded corpus")
    out.foreach { case (_, _, len, nw) =>
      assert(len == nw + 7, s"span_len must be n_windows + minTokens - 1: $len vs $nw")
    }
    out.toSeq.groupBy(_._1).foreach { case (_, spans) =>
      spans.sliding(2).foreach {
        case Seq((_, s1, _, n1), (_, s2, _, _)) =>
          // islands split on a position gap ≥ 2
          assert(s2 >= s1 + n1 + 1, s"spans must be disjoint: ($s1,$n1) then $s2")
        case _ =>
      }
    }
    // the portable family reports the same spans (hash family only changes
    // the census keys, not which windows collide on real text)
    val port = Dedup.duplicateSpans(real, minTokens = 8, minDocs = 2, portable = true)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(port.toSeq == out.toSeq)
  }
}
