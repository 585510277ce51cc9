package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

// top-level, not nested in the spec: an inner case class needs the outer
// test instance, so its encoder falls back from codegen to interpreter
// (WARN noise in every suite run)
private[streaming] case class SdDoc(doc_id: Long, text: String, ts: Timestamp)

class StreamingDedupSpec extends SparkSpec {

  private def d(id: Long, text: String, sec: Long) =
    SdDoc(id, text, new Timestamp(1704067200000L + sec * 1000L))

  test("streaming exact dedup keeps first arrival, drops within- and cross-batch dups") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[SdDoc]
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString

    val deduped = StreamingDedup.dedupExact(source.toDF(), delay = "1 hour")
    val q = deduped.writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    // batch 1: a dup inside the batch (ids 1, 2 same text)
    source.addData(d(1, "alpha content", 0), d(2, "alpha content", 10), d(3, "beta content", 20))
    q.processAllAvailable()
    // batch 2: a cross-batch dup (id 4) and a new doc (id 5)
    source.addData(d(4, "alpha content", 30), d(5, "gamma content", 40))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted.toSeq
    // first arrival of "alpha content" is doc 1 (within-batch ties resolve
    // to one survivor; cross-batch dup 4 is dropped by state)
    assert(out.contains(3L) && out.contains(5L))
    assert(out.count(Set(1L, 2L, 4L)) == 1, s"exactly one alpha survivor, got $out")
    assert(out.size == 3, s"3 distinct contents, got $out")
  }

  test("normalized mode also drops case/punctuation variants across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[SdDoc]
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt2").toString

    val deduped = StreamingDedup.dedupExact(source.toDF(), delay = "1 hour", normalized = true)
    val q = deduped.writeStream
      .format("memory")
      .queryName("dedup_out_norm")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    source.addData(d(1, "Hello, World!", 0))
    q.processAllAvailable()
    source.addData(d(2, "hello world", 10), d(3, "different entirely", 20))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out_norm").select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L), s"variant must be dropped, got $out")
  }
}
