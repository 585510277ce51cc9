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

  private def persisted: Int = spark.sparkContext.getPersistentRDDs.size

  private def docs = {
    val session = spark
    import session.implicits._
    (1 to 60).map { i =>
      val base = s"alpha beta gamma delta epsilon zeta eta theta iota kappa word$i"
      (s"d$i", if (i % 3 == 0) base else base + s" tail${i % 7} more${i % 5}")
    }.toDF("doc_id", "text")
  }

  test("minHashLsh leaves no persisted frames behind") {
    val before = persisted
    val pairs = Dedup.minHashLsh(docs, threshold = 0.5).collect()
    assert(pairs.nonEmpty)
    assert(persisted == before, "minHashLsh must not leak cached frames")
  }

  test("simHashPairs leaves no persisted frames behind") {
    val before = persisted
    Dedup.simHashPairs(docs, maxHamming = 8).collect()
    assert(persisted == before, "simHashPairs must not leak cached frames")
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
    val before = persisted
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
    // the ONLY cached blocks left are the returned materialized result
    assert(persisted == before + 1, "SCC must free all internal caches")
    GraftSqlInternals.cachedRdd(out).foreach(_.unpersist(true))
    assert(persisted == before, "releasing the result returns to baseline")
  }
}
