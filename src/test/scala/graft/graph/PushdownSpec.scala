package graft.graph

import graft.SparkSpec
import graft.rel.Predicates.F
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Pushdown evidence, asserted rather than eyeballed: the composed view
 * chain (window + layer + projection) and the predicate algebra must reach
 * the parquet scan as PushedFilters with a pruned ReadSchema — at 100 TB
 * this is the difference between scanning a partition slice and scanning
 * the lake. (AQE is disabled inside the test so the FileSourceScan sits in
 * the executed plan directly; the pushdown itself is AQE-independent.)
 */
class PushdownSpec extends SparkSpec {

  private def withNoAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail(s"no parquet scan in plan:\n${df.queryExecution.executedPlan}"))

  test("window + layer view chain pushes filters and prunes columns at the scan") {
    val dir = Files.createTempDirectory("graft-pushdown").toString
    TemporalGraph
      .fromTriples(spark, Seq((1L, 2L, 10L), (2L, 3L, 25L), (3L, 4L, 45L)))
      .edges.write.mode("overwrite").parquet(dir)

    withNoAqe {
      val g = TemporalGraph(spark.read.parquet(dir))
      val q = g.window(10, 40).layer("_default").simpleEdges
      val scan = scanOf(q)
      val pushed = scan.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("GreaterThanOrEqual(ts,10)"), pushed)
      assert(pushed.contains("LessThan(ts,40)"), pushed)
      assert(pushed.contains("EqualTo(layer,_default)") || pushed.contains("In(layer"), pushed)
      // column pruning: only the join keys + the filter columns are read
      val read = scan.requiredSchema.fieldNames.toSet
      assert(read == Set("src", "dst", "ts", "layer"), read.toString)
    }
  }

  test("predicate-algebra filters push to the documents scan") {
    val dir = Files.createTempDirectory("graft-pushdown-docs").toString
    val session = spark
    import session.implicits._
    Seq(("d1", "alpha beta", 10L), ("d2", "gamma", 25L), ("d3", "delta", 45L))
      .toDF("doc_id", "text", "len")
      .write.mode("overwrite").parquet(dir)

    withNoAqe {
      val docs = spark.read.parquet(dir)
      val pred = (F("len") > 5L) && F("doc_id").startsWith("d")
      val q = docs.filter(pred.compile).select("doc_id")
      val scan = scanOf(q)
      val pushed = scan.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("GreaterThan(len,5)"), pushed)
      assert(pushed.contains("StringStartsWith(doc_id,d)"), pushed)
      assert(scan.requiredSchema.fieldNames.toSet == Set("doc_id", "len"))
    }
  }
}
