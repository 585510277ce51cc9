package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/**
 * Physical-plan contract for the iterative superstep shape: the persisted
 * CSR adjacency (the big, static side) must NOT sit under a shuffle
 * exchange in the per-superstep message join — its cached layout
 * (hash-partitioned on the join key by construction, see
 * [[TemporalGraph.adjacencyOut]]) is reused every superstep, and only the
 * narrow state frame is exchanged. This is the steady-state cost model the
 * scaling gate depends on; a regression here re-shuffles the whole edge
 * set once (PageRank/LPA) or twice (HITS) per superstep.
 *
 * AQE and auto-broadcast are disabled inside these tests: at production
 * scale the adjacency is far above any broadcast threshold, and the
 * no-exchange property must hold for the shuffled-join path the big run
 * takes (at toy scale Spark would otherwise just broadcast the CSR, which
 * proves nothing about the steady-state shuffle shape).
 */
class SuperstepPlanSpec extends SparkSpec {

  private def g: TemporalGraph = {
    val triples = (1L to 400L).map(i => (i % 40, i % 37, 1000L + i))
    TemporalGraph.fromTriples(spark, triples)
  }

  private def withShuffledJoins[A](body: => A): A = {
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  /** True if a shuffle exchange sits BETWEEN the cached adjacency scan and
    * its nearest join ancestor — i.e. the adjacency side itself is being
    * re-partitioned to satisfy the join. (Exchanges ABOVE the join — the
    * message groupBy — are inherent and fine.) */
  private def adjacencyReExchanged(plan: SparkPlan): Boolean = {
    def pathToScan(p: SparkPlan): Option[List[SparkPlan]] =
      if (p.isInstanceOf[InMemoryTableScanExec]) Some(List(p))
      else p.children.view.flatMap(pathToScan).headOption.map(p :: _)
    pathToScan(plan) match {
      case Some(rootToScan) =>
        val scanUpToJoin = rootToScan.reverse
          .takeWhile(!_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
        scanUpToJoin.exists(_.isInstanceOf[ShuffleExchangeExec])
      case None => true
    }
  }

  private def assertAdjacencyStaysPut(msgAgg: DataFrame): Unit = {
    val plan = msgAgg.queryExecution.executedPlan
    assert(
      plan.collectFirst { case s: InMemoryTableScanExec => s }.isDefined,
      s"expected the persisted adjacency in the plan:\n$plan")
    assert(
      !adjacencyReExchanged(plan),
      s"persisted adjacency must not be re-exchanged per superstep:\n$plan")
  }

  test("PageRank-shaped superstep reuses the out-CSR partitioning") {
    withShuffledJoins {
      val adj = g.adjacencyOut(1 << 17).persist()
      adj.count()
      val state = g.nodes.select(col("id"), lit(0.5).as("score")).localCheckpoint(true)
      val msgs = adj
        .join(state, adj("src") === state("id"))
        .select(explode(col("dsts")).as("id"), (col("score") / col("out_deg")).as("w"))
        .groupBy("id")
        .agg(sum("w").as("msum"))
      assertAdjacencyStaysPut(msgs)
      adj.unpersist(true)
    }
  }

  test("LPA superstep reuses the BOTH-CSR partitioning") {
    withShuffledJoins {
      val adj = g.adjacencyBoth(1 << 17).persist()
      adj.count()
      val state = g.nodes.select(col("id"), col("id").as("label")).localCheckpoint(true)
      val tally = adj
        .join(state, adj("node") === state("id"))
        .select(explode(col("nbrs")).as("id"), col("label"))
        .groupBy("id", "label")
        .agg(count(lit(1)).as("votes"))
      assertAdjacencyStaysPut(tally)
      adj.unpersist(true)
    }
  }

  test("HITS fused superstep reuses the signed-CSR partitioning") {
    withShuffledJoins {
      val adj = g.adjacencySigned(1 << 17).persist()
      adj.count()
      val state = g.nodes
        .select(col("id"), lit(1.0).as("hub"), lit(1.0).as("auth"))
        .localCheckpoint(true)
      // the fused pass: ONE join + ONE explode + ONE groupBy carries both
      // the hub and the auth message streams (Hits.scala superstep body)
      val recv = adj
        .join(state, adj("node") === state("id"))
        .select(explode(col("nbrs")).as("m"), col("hub"), col("auth"))
        .select(
          col("m.nbr").as("id"),
          when(col("m.out") === 1, col("hub")).as("hub_msg"),
          when(col("m.out") === 0, col("auth")).as("auth_msg"))
        .groupBy("id")
        .agg(sum("hub_msg").as("recv_hub"), sum("auth_msg").as("recv_auth"))
      assertAdjacencyStaysPut(recv)
      adj.unpersist(true)
    }
  }

  test("weighted-PageRank superstep reuses the weighted-CSR partitioning") {
    withShuffledJoins {
      val weights = g.simpleEdges.withColumn("w", lit(1L))
      val adj = g.adjacencyOutWeighted(weights, 1 << 17).persist()
      adj.count()
      val state = g.nodes.select(col("id"), lit(0.5).as("score")).localCheckpoint(true)
      val msgs = adj
        .join(state, adj("src") === state("id"))
        .select(explode(col("dsts")).as("m"), col("score"), col("out_w"))
        .select(col("m.dst").as("id"), (col("score") * col("m.w") / col("out_w")).as("wv"))
        .groupBy("id")
        .agg(sum("wv").as("msum"))
      assertAdjacencyStaysPut(msgs)
      adj.unpersist(true)
    }
  }

  test("signed CSR carries both directions exactly once per directed edge") {
    val tg = TemporalGraph.fromTriples(
      spark,
      Seq((1L, 2L, 10L), (2L, 1L, 20L), (2L, 3L, 30L), (1L, 2L, 40L)))
    val rows = tg.adjacencySigned(1 << 17)
      .select(col("node"), explode(col("nbrs")).as("e"))
      .select(col("node"), col("e.nbr").as("nbr"), col("e.out").as("out"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // distinct directed edges: 1→2, 2→1, 2→3; duplicate 1→2@40 deduped
    assert(rows == Set(
      (1L, 2L, 1), (2L, 1L, 0), // 1→2
      (2L, 1L, 1), (1L, 2L, 0), // 2→1
      (2L, 3L, 1), (3L, 2L, 0))) // 2→3
  }

  test("Louvain-shaped round reuses the weighted-CSR partitioning") {
    withShuffledJoins {
      // the per-level weighted CSR Louvain.localMoving builds: keyed by the
      // message source, persisted, hash-partitioned by the groupBy
      val pairs = g.canonicalUndirected.withColumn("w", lit(1.0))
      val bi = pairs
        .select(col("a").as("other"), col("b").as("nbr"), col("w"))
        .unionByName(pairs.select(col("b").as("other"), col("a").as("nbr"), col("w")))
      val deg = bi.groupBy("other").agg(count(lit(1)).as("deg"))
      val adj = bi
        .join(deg, Seq("other"))
        .withColumn(
          "salt",
          pmod(xxhash64(col("nbr")), greatest(ceil(col("deg") / 65536.0), lit(1L))).cast("int"))
        .groupBy("other", "salt")
        .agg(collect_list(struct(col("nbr"), col("w"))).as("entries"))
        .persist()
      adj.count()
      val state = g.nodes
        .select(col("id"), col("id").as("com"), lit(1.0).as("k"))
        .localCheckpoint(true)
      val wcom = adj
        .join(state.select(col("id").as("other"), col("com").as("ocom")), Seq("other"))
        .select(col("ocom"), explode(col("entries")).as("e"))
        .groupBy(col("e.nbr").as("id"), col("ocom").as("cand"))
        .agg(sum(col("e.w")).as("w_cand"))
      assertAdjacencyStaysPut(wcom)
      adj.unpersist(true)
    }
  }

  test("in-CSR shards a planted in-hub and reassembles exactly") {
    val hubEdges = (1 to 3000).map(i => (i.toLong, 0L, 1000L + i))
    val hg = TemporalGraph.fromTriples(spark, hubEdges)
    val adj = hg.adjacencyIn(256)
    val shards = adj.filter(col("dst") === 0L)
      .select(size(col("srcs")).as("n"), col("in_deg"))
      .collect()
    assert(shards.length == math.ceil(3000 / 256.0).toInt)
    assert(shards.forall(_.getAs[Long]("in_deg") == 3000L))
    val reassembled = adj.filter(col("dst") === 0L)
      .select(explode(col("srcs")).as("s")).distinct().count()
    assert(reassembled == 3000L)
  }
}
