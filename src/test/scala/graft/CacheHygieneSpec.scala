package graft

import graft.algos.Scc
import graft.graph.TemporalGraph
import graft.ml.Dedup
import org.apache.spark.sql.GraftSqlInternals

/**
 * Cache-lifecycle contract for the operators the round-2 review flagged as
 * leaking persisted frames in a long-lived session: after an operator
 * returns (and its materialized result is released), the session's
 * persistent-RDD registry must be back to its pre-call size. Dedup's LSH
 * paths now run persist-free; SCC frees every internal cache and returns a
 * single materialized frame the caller owns.
 */
class CacheHygieneSpec extends SparkSpec {

  /** Ids, not counts: suites share the session, and the ContextCleaner can
    * asynchronously drop OTHER suites' unreachable cached RDDs mid-test —
    * a count compare is racy against that; a new-ids set difference is not. */
  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def docs = {
    val session = spark
    import session.implicits._
    (1 to 60).map { i =>
      val base = s"alpha beta gamma delta epsilon zeta eta theta iota kappa word$i"
      (s"d$i", if (i % 3 == 0) base else base + s" tail${i % 7} more${i % 5}")
    }.toDF("doc_id", "text")
  }

  test("minHashLsh leaves no persisted frames behind") {
    val before = persistedIds
    val pairs = Dedup.minHashLsh(docs, threshold = 0.5).collect()
    assert(pairs.nonEmpty)
    assert((persistedIds -- before).isEmpty, "minHashLsh must not leak cached frames")
  }

  test("simHashPairs leaves no persisted frames behind") {
    val before = persistedIds
    Dedup.simHashPairs(docs, maxHamming = 8).collect()
    assert((persistedIds -- before).isEmpty, "simHashPairs must not leak cached frames")
  }

  test("simHash hot buckets are dropped with first-class accounting") {
    val session = spark
    import session.implicits._
    // 30 identical docs → every segment bucket has 30 members
    val hot = (1 to 30).map(i => (s"h$i", "same text every time")).toDF("doc_id", "text")
    val dropped = Dedup.simHashDropped(hot, maxBucket = 10)
    assert(dropped.count() > 0)
    assert(Dedup.simHashPairs(hot, maxBucket = 10).count() == 0L)
    // generous cap → nothing dropped, all pairs found
    assert(Dedup.simHashDropped(hot, maxBucket = 1000).count() == 0L)
    assert(Dedup.simHashPairs(hot, maxBucket = 1000).count() == 30L * 29 / 2)
  }

  test("SCC frees every internal cache; caller owns exactly the result") {
    val before = persistedIds
    // two 3-cycles joined by a one-way bridge + a tail chain
    val triples = Seq(
      (1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 3L),
      (3L, 4L, 4L),
      (4L, 5L, 5L), (5L, 6L, 6L), (6L, 4L, 7L),
      (6L, 7L, 8L), (7L, 8L, 9L))
    val out = Scc.run(spark, TemporalGraph.fromTriples(spark, triples))
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == labels(2L) && labels(2L) == labels(3L))
    assert(labels(4L) == labels(5L) && labels(5L) == labels(6L))
    assert(labels(1L) != labels(4L) && labels(7L) != labels(8L))
    // the ONLY new cached block is the returned materialized result
    val leaked = persistedIds -- before
    assert(leaked.size == 1, s"SCC must free all internal caches (left: $leaked)")
    GraftSqlInternals.cachedRdd(out).foreach(_.unpersist(true))
    assert((persistedIds -- before).isEmpty, "releasing the result returns to baseline")
  }
}
