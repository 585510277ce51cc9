package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  /** Two well-separated 2-d blobs around (0,0) and (10,10), deterministic
    * jitter from the id. */
  private def blobs = {
    val rows = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      val jx = ((i * 37 % 11).toFloat - 5f) / 10f
      val jy = ((i * 53 % 13).toFloat - 6f) / 10f
      (i, Seq(base + jx, base + jy))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("two separated blobs resolve to the blob partition, k=2") {
    val r = Clustering.kmeans(blobs, k = 2, assignRounds = 3)
    val rows = r.assignment.collect()
    assert(rows.length == 40)
    // every even id (blob at 0) shares one cluster; every odd id the other
    val byBlob = rows.groupBy(_.getLong(0) % 2).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(byBlob(0L).size == 1 && byBlob(1L).size == 1 && byBlob(0L) != byBlob(1L))
    // cluster_n accounts for everything
    assert(rows.map(_.getLong(3)).sum == 40L * 20L) // each of 40 rows carries its cluster's size 20
    // final centroids sit at the blob means (within the jitter envelope)
    val cents = r.centroids.map(_._2)
    assert(cents.exists(c => math.abs(c(0)) < 1.0 && math.abs(c(1)) < 1.0))
    assert(cents.exists(c => math.abs(c(0) - 10.0) < 1.0 && math.abs(c(1) - 10.0) < 1.0))
  }

  test("assignment dist is the exact minimum over the final centroids") {
    val r = Clustering.kmeans(blobs, k = 3, assignRounds = 2)
    val cents = r.centroids
    val vecs = blobs.collect().map(row => row.getLong(0) -> row.getSeq[Float](1).map(_.toDouble)).toMap
    r.assignment.collect().foreach { row =>
      val v = vecs(row.getLong(0))
      val dists = cents.map { case (rank, cv) =>
        val d = v.zip(cv).map { case (x, c) => (x - c) * (x - c) }.sum
        rank -> BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val (bestRank, bestD) = dists.minBy { case (rank, d) => (d, rank) }
      assert(row.getLong(1) == bestRank.toLong)
      assert(math.abs(row.getDouble(2) - bestD) < 1e-9)
    }
  }

  test("deterministic across partitionings; empty clusters keep their init centroid") {
    val a = Clustering.kmeans(blobs.repartition(1), k = 2, assignRounds = 3)
      .assignment.orderBy("vec_id").collect().toSeq
    val b = Clustering.kmeans(blobs.repartition(7), k = 2, assignRounds = 3)
      .assignment.orderBy("vec_id").collect().toSeq
    assert(a == b)
    // all-identical corpus, k=2: both init pivots are the same vector, so
    // every point ties to rank 1 and cluster 2 is empty from round one —
    // its centroid must survive as the init value (coalesce), never NaN
    val tiny = Seq(
      (1L, Seq(2f, 2f)), (2L, Seq(2f, 2f)), (3L, Seq(2f, 2f)), (4L, Seq(2f, 2f)))
      .toDF("vec_id", "embedding")
    val r = Clustering.kmeans(tiny, k = 2, assignRounds = 3)
    assert(r.centroids.length == 2)
    assert(r.centroids.forall(_._2.toSeq == Seq(2.0, 2.0)))
    val rows = r.assignment.collect()
    assert(rows.forall(_.getLong(1) == 1L) && rows.forall(_.getLong(3) == 4L))
  }

  test("plan shape: the assignment pass never shuffles the corpus") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val assigned = Clustering.kmeans(blobs, k = 4, assignRounds = 1).assignment
      // the only exchange allowed is the <= partitions x k row cluster-sizes
      // partial aggregation; the corpus side must be shuffle-free with the
      // sizes coming back via broadcast join
      val plan = assigned.queryExecution.executedPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size <= 1, s"corpus assignment must not shuffle:\n$plan")
      assert(
        plan.toString.contains("BroadcastHashJoin"),
        s"cluster sizes must come back via broadcast join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
