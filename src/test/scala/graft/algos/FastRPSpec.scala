package graft.algos

import graft.SparkSpec
import graft.graph.TemporalGraph

class FastRPSpec extends SparkSpec {

  test("fast-rp: deterministic, right shape, neighbours closer than strangers") {
    // two cliques joined by one bridge edge
    val cliqueA = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val cliqueB = for (a <- 11L to 15L; b <- (a + 1) to 15L) yield (a, b)
    val edges = (cliqueA ++ cliqueB :+ (5L, 11L)).zipWithIndex
      .map { case ((s, d), i) => (s, d, i.toLong) }
    val g = TemporalGraph.fromTriples(spark, edges)

    val emb = FastRP.run(spark, g, embeddingDim = 32, iterWeights = Seq(1.0, 1.0, 1.0))
    val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.size == 10)
    assert(rows.values.forall(_.length == 32))
    assert(rows.values.forall(v => v.exists(_ != 0.0)), "no all-zero embeddings")

    // determinism
    val again = FastRP.run(spark, g, embeddingDim = 32, iterWeights = Seq(1.0, 1.0, 1.0))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.keys.forall(k => rows(k).sameElements(again(k))))

    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0 else dot / (na * nb)
    }
    // same-clique pairs should on average be more similar than cross-clique
    val sameA = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield cos(rows(a), rows(b))
    val cross = for (a <- 1L to 5L; b <- 12L to 15L) yield cos(rows(a), rows(b))
    assert(sameA.sum / sameA.size > cross.sum / cross.size,
      s"intra=${sameA.sum / sameA.size} cross=${cross.sum / cross.size}")
  }
}
