package graft.server

import org.apache.spark.sql.functions._

import graft.graph.TemporalGraph

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/**
 * Client for a running [[QueryServer]] — the analog of the reference's
 * GraphQL client (raphtory-graphql/src/client/raphtory_client.rs:
 * `send_graph` :134, `query` :82, `is_healthy` :57), which is what the
 * reference's `graph.export_to(server)` rides on.
 *
 * [[sendGraph]] ships a graph's edge events to the server in bounded JSON
 * batches; each batch is one WAL commit on the server (atomic manifest),
 * so a client crash mid-export leaves a readable prefix, never a torn
 * graph. Like the reference's `send_graph` — which encodes the WHOLE graph
 * through the client process — this is a control-plane operation for
 * graph-sized data: edges stream through the driver via `toLocalIterator`
 * (one partition's rows in memory at a time, one job per partition). To
 * move corpus-scale graphs between deployments, ship the [[graft.sources
 * .GraphStore]] parquet layout directly and point a server at it.
 */
object GraphClient {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private lazy val http = HttpClient.newHttpClient()

  private def post(url: String, body: String): (Int, String) = {
    val req = HttpRequest
      .newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val r = http.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  /** True when the server answers the catalog route (reference
    * `is_healthy`). */
  def isHealthy(baseUrl: String): Boolean =
    try {
      val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/graphs")).GET().build()
      http.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() == 200
    } catch { case scala.util.control.NonFatal(_) => false }

  /**
   * Export a graph's edge events to `path` on the server (the reference's
   * `export_to` / `send_graph`), in `batchSize`-row JSON batches. Missing
   * `ts`/`event_id`/`layer` columns are defaulted the same way the ingest
   * route defaults them.
   *
   * @param compactAfter fold the server-side WAL into a bucketed parquet
   *                     snapshot once all batches are committed
   * @return number of edge events shipped
   */
  def sendGraph(
      g: TemporalGraph,
      baseUrl: String,
      path: String,
      batchSize: Int = 10000,
      compactAfter: Boolean = true): Long = {
    require(batchSize > 0, "batchSize must be positive")
    val cols = g.edges.columns.toSet
    def longOr(name: String, dflt: Long) =
      (if (cols(name)) col(name) else lit(dflt)).cast("long").as(name)
    val df = g.edges.select(
      col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"),
      longOr("ts", 0L),
      longOr("event_id", 0L),
      (if (cols("layer")) col("layer") else lit("_default")).cast("string").as("layer"))
    var total = 0L
    val it = df.toLocalIterator()
    val batch = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](batchSize)
    def flush(): Unit = if (batch.nonEmpty) {
      val arr = mapper.createArrayNode()
      batch.foreach { r =>
        val o = arr.addObject()
        o.put("src", r.getLong(0))
        o.put("dst", r.getLong(1))
        o.put("ts", r.getLong(2))
        o.put("event_id", r.getLong(3))
        o.put("layer", r.getString(4))
      }
      val (code, body) = post(s"$baseUrl/graphs/$path", arr.toString)
      require(code == 200, s"send_graph batch failed ($code): $body")
      total += batch.size
      batch.clear()
    }
    while (it.hasNext) {
      batch += it.next()
      if (batch.size >= batchSize) flush()
    }
    flush()
    if (compactAfter && total > 0) {
      val (code, body) = post(s"$baseUrl/graphs/$path/compact", "")
      require(code == 200, s"compact failed ($code): $body")
    }
    total
  }

  /** Run a [[graft.graph.GraphQuery]] wire document against a served graph
    * (reference client `query`); returns the JSON result envelope. */
  def query(baseUrl: String, path: String, document: String): String = {
    val (code, body) = post(s"$baseUrl/query/$path", document)
    require(code == 200, s"query failed ($code): $body")
    body
  }

  /** Run a Cypher-lite MATCH query against a served graph. */
  def cypher(baseUrl: String, path: String, q: String): String = {
    val (code, body) = post(s"$baseUrl/cypher/$path", q)
    require(code == 200, s"cypher failed ($code): $body")
    body
  }
}
