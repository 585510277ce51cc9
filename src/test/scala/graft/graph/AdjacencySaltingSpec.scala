package graft.graph

import graft.SparkSpec
import graft.algos.PageRank
import org.apache.spark.sql.functions._

/**
 * Hub-salted CSR adjacency (north rule: "explicit salting for hub-turn
 * skew"): a planted high-degree hub must be sharded into bounded rows, the
 * sharded adjacency must carry the exact neighbour set and total degree,
 * and PageRank over the sharded CSR must match the unsharded scores.
 */
class AdjacencySaltingSpec extends SparkSpec {

  private val hubDeg = 5000
  private def hubGraph: TemporalGraph = {
    // hub 0 → 1..5000, plus a tail chain 1→2→…→50 for some structure
    val hubEdges = (1 to hubDeg).map(i => (0L, i.toLong, 1000L + i))
    val chain = (1 until 50).map(i => (i.toLong, (i + 1).toLong, 9000L + i))
    TemporalGraph.fromTriples(spark, hubEdges ++ chain)
  }

  test("hub rows are sharded and bounded; shards reassemble exactly") {
    val g = hubGraph
    val adj = g.adjacencyOut(256)
    val hubShards = adj.filter(col("src") === 0L)
      .select(size(col("dsts")).as("n"), col("out_deg"), col("salt"))
      .collect()

    assert(hubShards.length == math.ceil(hubDeg / 256.0).toInt,
      s"expected ceil($hubDeg/256) shards, got ${hubShards.length}")
    // hash-balanced shards: no shard dramatically above the cap
    assert(hubShards.forall(_.getAs[Int]("n") <= 2 * 256),
      "each shard must stay near the cap")
    assert(hubShards.forall(_.getAs[Long]("out_deg") == hubDeg.toLong),
      "every shard carries the TOTAL out-degree")

    // the union of shard contents is the exact distinct neighbour set
    val reassembled = adj.filter(col("src") === 0L)
      .select(explode(col("dsts")).as("d"))
      .distinct()
      .count()
    assert(reassembled == hubDeg.toLong)

    // non-hub sources keep the single-row CSR property
    val chainRows = adj.filter(col("src") === 1L).count()
    assert(chainRows == 1L)
  }

  test("PageRank over the sharded CSR matches unsharded scores") {
    val g = hubGraph
    def scores(maxShard: Int): Map[Long, Double] =
      PageRank
        .run(spark, g, PageRank.Config(maxIter = 15, tol = 0.0, maxShard = maxShard))
        .collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Double]("score"))
        .toMap

    val sharded = scores(256)
    val unsharded = scores(1 << 20)
    assert(sharded.keySet == unsharded.keySet)
    sharded.foreach { case (id, s) =>
      assert(math.abs(s - unsharded(id)) < 1e-12, s"node $id: $s vs ${unsharded(id)}")
    }
  }
}
