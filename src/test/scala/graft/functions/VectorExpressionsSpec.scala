package graft.functions

import graft.SparkSpec
import graft.ml.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  import java.lang.Double.doubleToLongBits

  /** Deterministic pseudo-random float vectors (no driver RNG). */
  private def vecs(n: Int, dim: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map { j =>
        val h = (i * 1103515245L + j * 12345L + 7L) % 1000003L
        (h.toDouble / 1000003.0).toFloat * 2f - 1f
      })
    }

  test("native cosine is BIT-identical to the zip_with/aggregate SQL form (float32)") {
    import spark.implicits._
    val pairs = vecs(64, 37).sliding(2).collect { case Seq((ia, a), (_, b)) => (ia, a, b) }.toSeq
    val df = pairs.toDF("id", "va", "vb")
      .select(col("id"), col("va").cast("array<float>").as("va"), col("vb").cast("array<float>").as("vb"))
    val out = df.select(
      Similarity.cosine("va", "vb").as("fast"),
      Similarity.cosineSql("va", "vb").as("ref")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(doubleToLongBits(r.getDouble(0)) == doubleToLongBits(r.getDouble(1)),
        s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("native cosine is BIT-identical on float64 and mixed element types") {
    import spark.implicits._
    val pairs = vecs(32, 19).sliding(2).collect { case Seq((ia, a), (_, b)) => (ia, a, b) }.toSeq
    val df = pairs.toDF("id", "va", "vb")
      .select(
        col("id"),
        col("va").cast("array<double>").as("da"),
        col("vb").cast("array<double>").as("db"),
        col("vb").cast("array<float>").as("fb"))
    val out = df.select(
      Similarity.cosine("da", "db").as("fast_dd"),
      Similarity.cosineSql("da", "db").as("ref_dd"),
      Similarity.cosine("da", "fb").as("fast_df"),
      // mixed reference: float side widened exactly as zip_with's cast does
      Similarity.cosineSql("da", "fb").as("ref_df")).collect()
    out.foreach { r =>
      assert(doubleToLongBits(r.getDouble(0)) == doubleToLongBits(r.getDouble(1)))
      assert(doubleToLongBits(r.getDouble(2)) == doubleToLongBits(r.getDouble(3)))
    }
  }

  test("degenerate inputs are NULL, not errors: length mismatch, null element, zero vector") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1f, 2f), Seq(1f, 2f, 3f)), // length mismatch
      (2L, Seq(0f, 0f), Seq(1f, 2f)), // zero-norm left
      (3L, Seq(1f, 2f), Seq(3f, 4f)) // healthy
    ).toDF("id", "va", "vb")
      .select(col("id"),
        col("va").cast("array<float>").as("va"),
        col("vb").cast("array<float>").as("vb"))
      // inject a null element for id=2's vb replacement — build via expr
      .withColumn("vb",
        when(col("id") === 2L, expr("array(cast(null as float), cast(1.0 as float))"))
          .otherwise(col("vb")))
    val rows = df.select(col("id"), Similarity.cosine("va", "vb").as("c"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1), "length mismatch must be NULL")
    assert(rows(1).isNullAt(1), "null element must be NULL")
    assert(!rows(2).isNullAt(1) && math.abs(rows(2).getDouble(1) - 11.0 / (math.sqrt(5) * 5.0)) < 1e-12)
  }

  test("zero-norm denominator is NULL") {
    import spark.implicits._
    val df = Seq((1L, Seq(0f, 0f), Seq(1f, 2f))).toDF("id", "va", "vb")
      .select(col("va").cast("array<float>").as("va"), col("vb").cast("array<float>").as("vb"))
    assert(df.select(Similarity.cosine("va", "vb")).collect()(0).isNullAt(0))
  }

  test("interpreted eval path matches codegen (expression survives codegen fallback)") {
    import spark.implicits._
    val df = vecs(8, 11).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
      .crossJoin(vecs(1, 11).toDF("qid", "q").select(col("q").cast("array<float>").as("q")))
    val codegen = df.select(Similarity.cosine("v", "q").as("c")).collect().map(_.getDouble(0))
    val interp = withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      df.select(Similarity.cosine("v", "q").as("c")).collect().map(_.getDouble(0))
    }
    assert(codegen.length == 8)
    codegen.zip(interp).foreach { case (a, b) =>
      assert(doubleToLongBits(a) == doubleToLongBits(b))
    }
  }

  test("graft_cosine is callable from SQL text after register()") {
    import spark.implicits._
    VectorExpressions.register(spark)
    Seq((Seq(1f, 0f), Seq(1f, 0f))).toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
      .createOrReplaceTempView("ve_sql_t")
    val v = spark.sql("SELECT graft_cosine(a, b) AS c FROM ve_sql_t").collect()(0).getDouble(0)
    assert(math.abs(v - 1.0) < 1e-15)
  }

  /** Run a block under temporary SQL conf values. */
  private def withSqlConf[T](kvs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val olds = kvs.map { case (k, _) => k -> scala.util.Try(conf.get(k)).toOption }
    kvs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
