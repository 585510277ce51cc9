package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  import spark.implicits._

  test("loaders: csv / json / parquet round-trip to the engine schema") {
    val dir = Files.createTempDirectory("graft-load").toString
    val df = Seq(
      ("a", "b", 1000L, "reply"),
      ("b", "c", 2000L, "reply"),
      (("a"), "c", 3000L, "tool"))
      .toDF("from", "to", "t", "kind")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    df.write.mode("overwrite").json(s"$dir/json")
    df.write.mode("overwrite").parquet(s"$dir/parquet")

    val cols = Loaders.EdgeColumns(src = "from", dst = "to", time = "t", layerCol = Some("kind"))
    val fromCsv = Loaders.edgesFromCsv(spark, s"$dir/csv", cols)
    val fromJson = Loaders.edgesFromJson(spark, s"$dir/json", cols)
    val fromParquet = Loaders.edgesFromParquet(spark, s"$dir/parquet", cols)

    for (g <- Seq(fromCsv, fromJson, fromParquet)) {
      assert(g.countTemporalEdges() == 3)
      assert(g.countNodes() == 3)
      assert(g.layer("tool").countTemporalEdges() == 1)
      val keys = g.edges.select("src_key", "dst_key").collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(keys == Set(("a", "b"), ("b", "c"), ("a", "c")))
    }
    // string ids hash consistently across loaders
    assert(
      fromCsv.edges.select("src").collect().map(_.getLong(0)).sorted.sameElements(
        fromJson.edges.select("src").collect().map(_.getLong(0)).sorted))
  }

  test("numeric ids pass through exactly; timestamps convert to millis") {
    val df = Seq((1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01")))
      .toDF("s", "d", "when")
    val g = Loaders.edgesFromDataFrame(df, Loaders.EdgeColumns("s", "d", "when", constantLayer = Some("x")))
    val row = g.collect()(0)
    assert(row.getAs[Long]("src") == 1L && row.getAs[Long]("dst") == 2L)
    assert(row.getAs[Long]("ts") == 1704067201000L)
    assert(row.getAs[String]("layer") == "x")
  }

  test("GraphStore: append, read, compact, HEAD, time travel") {
    val root = Files.createTempDirectory("graft-store").toString
    val store = new GraphStore(root, spark)

    def batch(es: Seq[(Long, Long, Long)]) =
      es.toDF("src", "dst", "ts")
        .withColumn("event_id", lit(0L))
        .withColumn("layer", lit("_d"))

    val b0 = store.append(batch(Seq((1L, 2L, 10L), (2L, 3L, 20L))))
    val b1 = store.append(batch(Seq((3L, 4L, 30L))))
    assert(b0 == 0 && b1 == 1)
    assert(store.read().countTemporalEdges() == 3)

    val s0 = store.compact()
    assert(s0 == 0 && store.headSnapshot.contains(0L))
    assert(store.read().countTemporalEdges() == 3)

    // appends after compaction land on top of the snapshot
    store.append(batch(Seq((4L, 5L, 40L))))
    assert(store.read().countTemporalEdges() == 4)
    // time travel ignores the tail
    assert(store.readSnapshot(0).countTemporalEdges() == 3)

    // second compaction folds the tail in
    val s1 = store.compact()
    assert(s1 == 1 && store.read().countTemporalEdges() == 4)
    // content preserved exactly through the bucketed snapshot layout
    val all = store.read().edges.select("src", "dst", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == Set((1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L), (4L, 5L, 40L)))
  }

  test("GraphArchive: export → import round-trips the full store; peek reads metadata") {
    val root = Files.createTempDirectory("graft-arch-src").toString
    val store = new GraphStore(root, spark)
    def batch(es: Seq[(Long, Long, Long)]) =
      es.toDF("src", "dst", "ts")
        .withColumn("event_id", lit(0L))
        .withColumn("layer", lit("_d"))
    store.append(batch(Seq((1L, 2L, 10L), (2L, 3L, 20L))))
    store.compact()
    store.append(batch(Seq((3L, 4L, 30L)))) // post-snapshot tail must survive too

    val zip = Files.createTempDirectory("graft-arch-zip").resolve("g.zip").toString
    GraphArchive.exportArchive(store, zip)

    val meta = GraphArchive.peek(zip)
    assert(meta.contains("\"graft-graph-archive\"") && meta.contains("\"head\":0"))

    val dest = Files.createTempDirectory("graft-arch-dst").toString + "/imported"
    val back = GraphArchive.importArchive(zip, dest, spark)
    assert(back.headSnapshot.contains(0L))
    assert(back.committedBatches == store.committedBatches)
    val got = back.read().edges.select("src", "dst", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L)))

    // guard rails: refuses to import over an existing store
    intercept[IllegalArgumentException](GraphArchive.importArchive(zip, dest, spark))
  }

  test("GraphArchive: zip-slip entries are rejected") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val evil = Files.createTempDirectory("graft-arch-evil").resolve("evil.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(evil))
    zos.putNextEntry(new ZipEntry(GraphArchive.RootMetaEntry))
    zos.write("""{"format":"graft-graph-archive","version":1}""".getBytes)
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("../escape.txt"))
    zos.write("x".getBytes)
    zos.closeEntry()
    zos.close()
    val dest = Files.createTempDirectory("graft-arch-evil-dst").toString + "/s"
    intercept[IllegalArgumentException](GraphArchive.importArchive(evil.toString, dest, spark))
  }
}
