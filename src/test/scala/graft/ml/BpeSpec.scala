package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("applyMerge: greedy-left fold, overlap takes every other pair") {
    val arrs = Seq(
      (1L, Seq("a", "a", "a")),
      (2L, Seq("a", "a", "a", "a")),
      (3L, Seq("x", "a", "a", "y")),
      (4L, Seq("b", "a")), // no occurrence
      (5L, Seq.empty[String]))
      .toDF("id", "syms")
    val out = arrs
      .select(col("id"), Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(out(1L) == List("aa", "a"))
    assert(out(2L) == List("aa", "aa"))
    assert(out(3L) == List("x", "aa", "y"))
    assert(out(4L) == List("b", "a"))
    assert(out(5L) == Nil)
    // distinct pair
    val ab = arrs
      .select(col("id"), Bpe.applyMerge(col("syms"), "x", "a").as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(ab(3L) == List("xa", "a", "y"))
  }

  test("learnMerges matches a hand-computed run, ties broken by pair asc") {
    // corpus: "abab" x3, "ab" x2, "cd" x4
    // round 1 pairs: (a,b) 3*2+2=8 > (b,a) 3 > (c,d) 4 → wait (c,d)=4 > (b,a)=3
    //   best (a,b)=8 → merge "ab"
    // round 2: words: [ab,ab] x3, [ab] x2, [c,d] x4 → (ab,ab)=3, (c,d)=4 → best (c,d)=4
    // round 3: (ab,ab)=3 → merged "abab"
    val docs = Seq(
      (1L, "abab ab cd"),
      (2L, "abab ab cd"),
      (3L, "abab cd cd")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, rounds = 3).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m(0) == ((1L, "a", "b", "ab", 8L)))
    assert(m(1) == ((2L, "c", "d", "cd", 4L)))
    assert(m(2) == ((3L, "ab", "ab", "abab", 3L)))
  }

  test("learnMerges stops early when no pair reaches minPairCount") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, rounds = 5, minPairCount = 2L)
    assert(m.count() == 0L)
    // with minPairCount=1 the three singleton pairs merge one per round
    // (ties by pair asc: ab, cd, ef), then no pairs remain → stops at 3
    val m1 = Bpe.learnMerges(docs, rounds = 5, minPairCount = 1L)
      .orderBy("round").collect()
    assert(m1.map(_.getString(3)).toSeq == Seq("ab", "cd", "ef"))
  }

  test("pair census plan: one partial-agg exchange feeding a bounded TakeOrdered argmax") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val state = Seq(("ab", 3L, Seq("a", "b")), ("abc", 2L, Seq("a", "b", "c")))
        .toDF("word", "cnt", "syms")
        .localCheckpoint(true)
      val plan = Bpe.pairCensus(state).limit(1).queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size == 1, s"census must exchange exactly once:\n$plan")
      assert(
        shuffles.head.child.collectFirst { case a: BaseAggregateExec => a }.isDefined,
        s"census exchange must be fed by a partial aggregate (map-side combine):\n$plan")
      assert(
        plan.toString.contains("TakeOrderedAndProject"),
        s"argmax must execute as a bounded TakeOrdered, not a global sort:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("segmentWords applies the learned table in rank order") {
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, rounds = 2).orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val seg = Bpe.segmentWords(Seq("abab", "ab", "ba").toDF("word"), merges.toSeq)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(seg("abab") == List("abab") || seg("abab") == List("ab", "ab"))
    // merges: round1 (a,b)->ab (count 2*2+1=5), round2 (ab,ab)->abab (count 2)
    assert(merges(0) == (("a", "b")) && merges(1) == (("ab", "ab")))
    assert(seg("abab") == List("abab"))
    assert(seg("ab") == List("ab"))
    assert(seg("ba") == List("b", "a"))
  }
}
