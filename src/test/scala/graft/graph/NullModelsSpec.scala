package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Null models (nullmodels.py parity): the shuffled column is a true
 * permutation, everything else stays put, and the permutation is a pure
 * function of (seed, key) — deterministic under repartitioning.
 */
class NullModelsSpec extends SparkSpec {

  private def edges = {
    val session = spark
    import session.implicits._
    (0L until 200L)
      .map(i => (i % 17, (i * 7) % 23, 1000L + i * 13, i, if (i % 2 == 0) "a" else "b"))
      .toDF("src", "dst", "ts", "event_id", "layer")
  }

  test("shuffleColumn permutes the multiset and leaves other columns in place") {
    val in = edges
    val out = NullModels.shuffleColumn(in, "ts", "event_id", seed = 7L)
    assert(out.columns.toSeq == in.columns.toSeq)
    // ts multiset preserved
    val a = in.groupBy("ts").count().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = out.groupBy("ts").count().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // every non-shuffled column unchanged per key
    val joined = in.as("i").join(out.as("o"), "event_id")
      .filter(
        col("i.src") =!= col("o.src") || col("i.dst") =!= col("o.dst") ||
          col("i.layer") =!= col("o.layer"))
    assert(joined.count() == 0L)
    // it actually moved something (overwhelmingly likely for 200 rows)
    val moved = in.as("i").join(out.as("o"), "event_id")
      .filter(col("i.ts") =!= col("o.ts")).count()
    assert(moved > 100L)
  }

  test("deterministic: same seed replays bit-for-bit, repartition-invariant") {
    val in = edges
    def runAt(parts: Int) =
      NullModels.shuffleColumn(in.repartition(parts), "ts", "event_id", seed = 7L)
        .select("event_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val one = runAt(1)
    assert(runAt(7) == one)
    assert(runAt(32) == one)
    // a different seed gives a different arrangement
    val other = NullModels.shuffleColumn(in, "ts", "event_id", seed = 8L)
      .select("event_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(other != one)
  }

  test("two-phase rank equals a plain global row_number join (exactness)") {
    val session = spark
    import session.implicits._
    val in = edges
    val out = NullModels.shuffleColumn(in, "ts", "event_id", seed = 7L, shards = 8)
      .select("event_id", "ts").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // reference: single-window global ranks under the same hash family
    import graft.ml.GraphLearn
    val h1 = GraphLearn.hmix(
      0L, GraphLearn.hmix(7L, col("event_id") -> GraphLearn.M1) -> GraphLearn.M3)
    val h2 = GraphLearn.hmix(
      0L, GraphLearn.hmix(7L, col("event_id") -> GraphLearn.M2) -> GraphLearn.M4)
    val w1 = org.apache.spark.sql.expressions.Window.orderBy(h1, col("event_id"))
    val w2 = org.apache.spark.sql.expressions.Window.orderBy(h2, col("event_id"))
    val rows = in.select(col("event_id"), row_number().over(w1).as("rk"))
    val vals = in.select(col("ts"), row_number().over(w2).as("rk"))
    val ref = rows.join(vals, "rk").select("event_id", "ts")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == ref)
  }

  test("shuffleColumns draws independent permutations per column") {
    val in = edges
    val out = NullModels.shuffleColumns(in, Seq("ts", "dst"), "event_id", seed = 7L)
    // both multisets preserved
    assert(out.select("ts").collect().map(_.getLong(0)).sorted.toSeq ==
      in.select("ts").collect().map(_.getLong(0)).sorted.toSeq)
    assert(out.select("dst").collect().map(_.getLong(0)).sorted.toSeq ==
      in.select("dst").collect().map(_.getLong(0)).sorted.toSeq)
    // the two permutations differ (same permutation would pair the same ranks)
    val tsPerm = out.select("event_id", "ts").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dstPerm = out.select("event_id", "dst").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inTs = in.select("event_id", "ts").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inDst = in.select("event_id", "dst").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // source-key maps: where did each row's value come from — must differ
    val fromTs = in.select("event_id").collect().map(_.getLong(0)).map { k =>
      k -> inTs.collect { case (k2, v) if v == tsPerm(k) => k2 }.min
    }
    val fromDst = in.select("event_id").collect().map(_.getLong(0)).map { k =>
      k -> inDst.collect { case (k2, v) if v == dstPerm(k) => k2 }.min
    }
    assert(fromTs.toSeq != fromDst.toSeq)
  }

  test("permutedTimestamps preserves the static multigraph") {
    val in = edges
    val out = NullModels.permutedTimestamps(in, seed = 3L)
    val a = in.groupBy("src", "dst", "layer").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val b = out.groupBy("src", "dst", "layer").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(a == b)
  }

  test("shuffleColumnWithin permutes only inside each group") {
    val in = edges
    val out = NullModels.shuffleColumnWithin(in, "ts", Seq("layer"), "event_id", seed = 5L)
    // per-group ts multisets preserved exactly
    val a = in.groupBy("layer", "ts").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = out.groupBy("layer", "ts").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    // other columns untouched per key; something moved within groups
    val j = in.as("i").join(out.as("o"), "event_id")
    assert(j.filter(col("i.src") =!= col("o.src") || col("i.layer") =!= col("o.layer"))
      .count() == 0L)
    assert(j.filter(col("i.ts") =!= col("o.ts")).count() > 50L)
    // repartition-invariant
    val one = out.select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val two = NullModels
      .shuffleColumnWithin(in.repartition(13), "ts", Seq("layer"), "event_id", seed = 5L)
      .select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(one == two)
  }

  test("link-sequence shuffle: per-(src,dst) timestamp multisets preserved") {
    val in = edges
    val out = NullModels.shuffleColumnWithin(in, "ts", Seq("src", "dst"), "event_id", seed = 9L)
    val a = in.groupBy("src", "dst", "ts").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = out.groupBy("src", "dst", "ts").count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
  }

  test("configurationModel preserves BOTH degree sequences exactly") {
    val in = edges
    val out = NullModels.configurationModel(in, seed = 11L)
    // out-degree per src exactly preserved (src never moves)
    val a = in.groupBy("src").count().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = out.groupBy("src").count().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // in-degree per node exactly preserved (dst column permuted)
    val ai = in.groupBy("dst").count().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bi = out.groupBy("dst").count().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ai == bi)
    // non-dst columns untouched per key; something actually rewired
    val j = in.as("i").join(out.as("o"), "event_id")
    assert(j.filter(col("i.src") =!= col("o.src") || col("i.ts") =!= col("o.ts"))
      .count() == 0L)
    assert(j.filter(col("i.dst") =!= col("o.dst")).count() > 50L)
    // determinism + partition invariance
    val one = out.select("event_id", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val two = NullModels.configurationModel(in.repartition(9), seed = 11L)
      .select("event_id", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(one == two)
  }

  test("validation is loud") {
    intercept[IllegalArgumentException](
      NullModels.shuffleColumn(edges, "nope", "event_id"))
    intercept[IllegalArgumentException](
      NullModels.shuffleColumn(edges, "ts", "nope"))
    intercept[IllegalArgumentException](
      NullModels.shuffleColumn(edges, "event_id", "event_id"))
    intercept[IllegalArgumentException](
      NullModels.shuffleColumnWithin(edges, "layer", Seq("layer"), "event_id"))
  }
}
