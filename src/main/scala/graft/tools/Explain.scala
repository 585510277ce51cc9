package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.TranscriptGen
import graft.graph.{EdgeBuilder, TemporalGraph}

/**
 * Plan-quality inspection: prints `explain("formatted")` for the hot plans
 * so pushdown / partitioning / codegen coverage can be reviewed (run
 * whenever an operator changes; see SURVEY §4).
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    println("==== parquet scan pushdown (q_scan_project) ====")
    graft.SparkEntry.queries("q_scan_project")(spark, sfDir).explain("formatted")

    println("==== broadcast star join (q_join_multiway_broadcast) ====")
    graft.SparkEntry.queries("q_join_multiway_broadcast")(spark, sfDir).explain("formatted")

    println("==== edge build (one conv-partitioned window) ====")
    val t = TranscriptGen.transcripts(spark, 100)
    EdgeBuilder.edges(t).explain("formatted")

    println("==== pagerank superstep shape (msgs join + agg) ====")
    val g = TemporalGraph(EdgeBuilder.edges(t)).persistedLike()

    println("==== BM25 search (postings semi-filter + broadcast stats) ====")
    graft.SparkEntry.queries("q_text_search")(spark, sfDir).explain("formatted")

    println("==== vector semantic search (windowless node top-k) ====")
    graft.SparkEntry.queries("q_vector_search")(spark, sfDir).explain("formatted")

    // expected shape: the duplicate-hash set (rare next to the corpus) is
    // BROADCAST as the LeftSemi build side, so the corpus-sized window
    // stream reaches the join with no exchange; the only wide exchange is
    // the per-doc island merge
    println("==== substring-dedup census (broadcast semi-join on dup hashes) ====")
    graft.SparkEntry.queries("q_dedup_substring")(spark, sfDir).explain("formatted")

    // expected shape: ONE hashpartitioning exchange (groupBy doc id) fed
    // by partial HashAggregates; weights are inline arithmetic, no join
    println("==== hashed linear classifier (one partial-agg exchange) ====")
    graft.SparkEntry.queries("q_text_classifier")(spark, sfDir).explain("formatted")

    // expected shape: broadcast pivots → map-side argmax groupBy(id), then
    // the cell window + in-cell pair join; CC runs on the tiny pair graph
    println("==== SemDeDup assignment + within-cell pairing ====")
    graft.SparkEntry.queries("q_dedup_semantic")(spark, sfDir).explain("formatted")

    // expected shape: pure map — zero exchanges anywhere
    println("==== document chunking (no shuffle) ====")
    graft.SparkEntry.queries("q_chunk_documents")(spark, sfDir).explain("formatted")

    println("==== ngram census (explode + lead window + wordcount groupBy + salted top-k) ====")
    graft.SparkEntry.queries("q_text_ngram_census")(spark, sfDir).explain("formatted")

    // expected shape: one vocabulary-sized exchange (pair groupBy with
    // partial aggregation) feeding TakeOrderedAndProject(limit=1) — the
    // per-round census of BPE training; the corpus-scale word count
    // happened once, before the loop
    println("==== BPE pair census (partial-agg exchange + TakeOrdered argmax) ====")
    locally {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val words = docs
        .select(explode(filter(split(lower(col("text")), "\\s+"), w => w =!= "")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .withColumn(
          "syms",
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .localCheckpoint(true)
      words
        .filter(size(col("syms")) > 1)
        .select(
          col("cnt"),
          explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p").getField("0").as("a"), col("p").getField("1").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1)
        .explain("formatted")
    }

    // expected shape: semi-join prune of the edge table to frontier
    // parents BEFORE the per-source rank window; WindowGroupLimit
    // pre-limits each partition to the fan-out before the window exchange
    println("==== GNN neighbor sampling (pruned rank windows) ====")
    graft.SparkEntry.queries("q_graph_neighbor_sample")(spark, sfDir).explain("formatted")

    // expected shape: candidate pairs join the degree-decorated neighbour
    // arrays twice (SortMergeJoin/shuffled-hash on the node key, one row
    // per node), features are ProjectExec array expressions — NO
    // CartesianProduct, no per-pair explode
    println("==== link-prediction features (two array joins, no explode) ====")
    graft.SparkEntry.queries("q_graph_link_features")(spark, sfDir).explain("formatted")

    spark.stop()
  }

  implicit final class GraphOps(private val g: TemporalGraph) extends AnyVal {
    def persistedLike(): Unit = {
      val adj = g.adjacencyOut.persist()
      val state = g.nodes.select(col("id"), lit(0.5).as("score")).localCheckpoint(true)
      val msgs = adj
        .join(state, adj("src") === state("id"))
        .select(explode(col("dsts")).as("id"), (col("score") / col("out_deg")).as("w"))
        .groupBy("id")
        .agg(sum("w").as("msum"))
      state.join(msgs, Seq("id"), "left").explain("formatted")
    }
  }
}
