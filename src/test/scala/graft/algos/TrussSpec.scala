package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph
import org.apache.spark.sql.functions._

class TrussSpec extends SparkSpec {
  import spark.implicits._

  private def graphOf(edges: Seq[(Long, Long)]) = TemporalGraph(
    edges.toDF("src", "dst")
      .withColumn("ts", lit(0L))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("layer", lit("_d")))

  /** brute-force k-truss peel on canonical undirected edges */
  private def bruteTruss(edges: Seq[(Long, Long)], k: Int): Map[(Long, Long), Int] = {
    var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct.toSet
    def sup(s: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val nbrs = (s.toSeq ++ s.toSeq.map(_.swap)).groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap.withDefaultValue(Set.empty[Long])
      s.map(e => e -> (nbrs(e._1) intersect nbrs(e._2)).size).toMap
    }
    var changed = true
    while (changed) {
      val sm = sup(es)
      val keep = es.filter(e => sm(e) >= k - 2)
      changed = keep != es
      es = keep
    }
    sup(es)
  }

  test("4-truss of a 5-clique plus pendant chain is exactly the clique") {
    val clique = for {
      a <- 1L to 5L; b <- 1L to 5L if a < b
    } yield (a, b)
    val edges = clique ++ Seq((5L, 10L), (10L, 11L), (11L, 12L))
    val got = Truss.run(spark, graphOf(edges), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == clique.toSet)
    got.values.foreach(s => assert(s == 3L)) // every clique edge closes 3 triangles
  }

  test("matches brute-force peel incl. cascade removals, k = 3 and 4") {
    // two triangles sharing an edge, plus a triangle attached by one edge,
    // plus a square (no triangles): cascades differ by k
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (1, 3), (2, 4), (3, 4),          // two triangles sharing (2,3)
      (4, 5), (5, 6), (6, 4),                          // triangle reached via (3,4)-(4,5)
      (7, 8), (8, 9), (9, 10), (10, 7))                // square
    for (k <- Seq(3, 4)) {
      val want = bruteTruss(edges, k)
      val got = Truss.run(spark, graphOf(edges), k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
      assert(got == want, s"k=$k: $got vs $want")
    }
  }

  test("duplicate and reversed edges collapse before peeling") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 1), (2, 3), (1, 3), (1, 3), (3, 1))
    val got = Truss.run(spark, graphOf(edges), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
