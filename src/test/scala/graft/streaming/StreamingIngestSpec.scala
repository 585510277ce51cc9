package graft.streaming

import graft.SparkSpec
import graft.data.TranscriptGen
import graft.graph.EdgeBuilder
import graft.sources.GraphStore

import java.nio.file.Files

class StreamingIngestSpec extends SparkSpec {

  test("streaming drops land in the GraphStore log and match batch edges") {
    val in = Files.createTempDirectory("graft-stream-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val storeDir = Files.createTempDirectory("graft-stream-store").toString
    val store = new GraphStore(storeDir, spark)

    val t = TranscriptGen.transcripts(spark, 20)
    t.write.mode("overwrite").parquet(in)

    val q = StreamingIngest.start(spark, in, store, ckpt)
    q.awaitTermination(120000)

    val streamed = store.read()
    val batch = EdgeBuilder.edges(spark.read.parquet(in))
    assert(streamed.countTemporalEdges() == batch.count())
    // content equality: same (src, dst, ts, layer) multiset
    assert(
      streamed.edges.select("src", "dst", "ts", "layer").exceptAll(
        batch.select("src", "dst", "ts", "layer")).count() == 0)
  }
}
