package graft.functions

import graft.SparkSpec
import graft.ml.{Dedup, Similarity}
import graft.vectors.HashEmbedder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bit-identity of the native sketch kernels against the composed-builtins
  * SQL forms they replaced — per hash family, including the degenerate
  * inputs, so the DuckDB oracle replays of the portable family are provably
  * untouched by the kernel swap. */
class HashExpressionsSpec extends SparkSpec {

  import java.lang.Double.doubleToLongBits

  /** Deterministic text corpus: ascii, repeated tokens, unicode, single
    * token, empty string, long doc. */
  private def texts: Seq[(Long, String)] = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "théta", "ω")
    val docs = (0 until 40).map { i =>
      val n = 1 + (i * 7) % 23
      (0 until n).map(j => words(((i + 1) * (j + 3)) % words.length)).mkString(" ")
    }
    (docs ++ Seq("", "solo", "a a a a a a a a", "naïve café über 東京")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
  }

  private def textDf: DataFrame = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  /** Direct array<bigint> edge inputs: nulls inside, empty, negatives.
    * The portable family's SQL form does long arithmetic on the values, so
    * under ANSI mode its domain is bounded (the production polyHash values
    * are < 2^30; the doc comment in Dedup pins all intermediates < 2^62) —
    * extreme longs are exercised only for the xxhash64 family, whose SQL
    * form never does arithmetic on the value. */
  private def edgeArrays(portable: Boolean): DataFrame = {
    val extremes =
      if (portable) "(array(-1L, 1000000006L, 536870911L))"
      else "(array(9223372036854775807L, -9223372036854775808L, 0L)), " +
        "(array(-1L, 1000000007L, 999999999999L))"
    spark.sql(
      s"""SELECT * FROM VALUES
         |  (array(1L, 2L, 3L)),
         |  (array(1L, NULL, 5L)),
         |  (array(NULL, NULL)),
         |  (cast(array() as array<bigint>)),
         |  $extremes
         |AS t(__hs)""".stripMargin)
      .withColumn("__th", col("__hs"))
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, clue: String): Unit = {
    val (ra, rb) = (a.collect().map(_.toString).sorted, b.collect().map(_.toString).sorted)
    assert(ra.toSeq == rb.toSeq, s"$clue:\n  fast=${ra.mkString("; ")}\n  ref =${rb.mkString("; ")}")
  }

  for (portable <- Seq(true, false)) {
    val fam = if (portable) "portable" else "xxhash64"

    test(s"MinHash kernel == SQL family on the text pipeline ($fam)") {
      val base =
        if (portable) s"transform(split(text, '\\\\s+'), s -> ${"" + Dedup.polyHashSql("s")})"
        else "transform(split(text, '\\\\s+'), s -> xxhash64(s))"
      val df = textDf.withColumn("__hs", expr(base))
      assertSameRows(
        df.select(col("doc_id"), HashExpressions.minHashSig(col("__hs"), 32, portable).as("mh")),
        df.select(col("doc_id"), expr(Dedup.minHashSigSql(32, portable)).as("mh")),
        s"minhash/$fam")
    }

    test(s"MinHash kernel == SQL family on edge arrays ($fam)") {
      val df = edgeArrays(portable)
      assertSameRows(
        df.select(HashExpressions.minHashSig(col("__hs"), 8, portable).as("mh")),
        df.select(expr(Dedup.minHashSigSql(8, portable)).as("mh")),
        s"minhash-edge/$fam")
    }

    test(s"SimHash kernel == SQL family on the text pipeline ($fam)") {
      val th =
        if (portable) s"transform(split(text, '\\\\s+'), tok -> ${Dedup.polyHashSql("tok")})"
        else "transform(split(text, '\\\\s+'), tok -> xxhash64(tok))"
      val df = textDf.withColumn("__th", expr(th))
      assertSameRows(
        df.select(col("doc_id"), HashExpressions.simHash(col("__th"), portable).as("fp")),
        df.select(col("doc_id"), expr(Dedup.simHashSql(portable)).as("fp")),
        s"simhash/$fam")
    }

    test(s"SimHash kernel == SQL family on edge arrays ($fam)") {
      val df = edgeArrays(portable)
      assertSameRows(
        df.select(HashExpressions.simHash(col("__th"), portable).as("fp")),
        df.select(expr(Dedup.simHashSql(portable)).as("fp")),
        s"simhash-edge/$fam")
    }

    test(s"window-hash kernel == SQL form ($fam)") {
      val th =
        if (portable) s"transform(split(text, '\\\\s+'), tok -> ${Dedup.polyHashSql("tok")})"
        else "transform(split(text, '\\\\s+'), tok -> xxhash64(tok))"
      val df = textDf.withColumn("__th", expr(th))
      assertSameRows(
        df.select(col("doc_id"),
          HashExpressions.windowHashes(col("__th"), 5, portable).as("wh")),
        df.select(col("doc_id"), expr(Dedup.windowHashesSql(5, portable)).as("wh")),
        s"windowhash/$fam")
      val edge = edgeArrays(portable)
      assertSameRows(
        edge.select(HashExpressions.windowHashes(col("__th"), 2, portable).as("wh")),
        edge.select(expr(Dedup.windowHashesSql(2, portable)).as("wh")),
        s"windowhash-edge/$fam")
    }

    test(s"plane signature kernel == SQL banded form ($fam, float and double)") {
      import spark.implicits._
      val vs = (0 until 25).map { i =>
        (i.toLong, (0 until 13).map { j =>
          (((i * 31 + j * 17 + 5) % 97).toDouble / 97.0 * 2.0 - 1.0).toFloat
        })
      } :+ (99L, Seq.empty[Float])
      val df = vs.toDF("id", "vf")
        .withColumn("vd", col("vf").cast("array<double>"))
      for (vecCol <- Seq("vf", "vd")) {
        val fast = df
          .withColumn("band", explode(expr("sequence(0, 3)")))
          .select(
            col("id"), col("band"),
            HashExpressions.planeSig(col(vecCol), col("band"), 8, 42L, portable).as("sig"))
        val ref = df
          .select(col("id"), Similarity.bandedSigSql(vecCol, 4, 8, 42L, portable).as("bs"))
          .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
        assertSameRows(fast, ref, s"planesig/$fam/$vecCol")
      }
    }

    test(s"hash embedding kernel == SQL form, bit-exact per dimension ($fam)") {
      val e = HashEmbedder(dim = 16, seed = 42L, portable = portable)
      val out = textDf
        .select(e.embed("text").as("fast"), e.embedSql("text").as("ref"))
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val (f, g) = (r.getSeq[Double](0), r.getSeq[Double](1))
        assert(f.size == 16 && g.size == 16)
        f.zip(g).foreach { case (x, y) =>
          assert(doubleToLongBits(x) == doubleToLongBits(y), s"embed bit mismatch: $x vs $y")
        }
      }
    }
  }

  test("plane signature: null vector element zeroes the signature, like the SQL form") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (cast(array(0.5, NULL, 0.25) as array<double>)),
        |  (cast(array(0.5, -0.25) as array<double>))
        |AS t(v)""".stripMargin)
    val fast = df
      .withColumn("band", explode(expr("sequence(0, 1)")))
      .select(col("band"), HashExpressions.planeSig(col("v"), col("band"), 8, 7L, true).as("sig"))
    val ref = df
      .select(Similarity.bandedSigSql("v", 2, 8, 7L, portable = true).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"))
    assertSameRows(fast, ref, "planesig-null-elem")
    assert(fast.filter(col("sig") === 0L).count() == 2) // the null-element vector
  }

  test("eqCount == size(filter(zip_with(...))) incl. length mismatch and nulls") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L, 3L), array(1L, 9L, 3L)),
        |  (array(1L, 2L), array(1L, 2L, 3L)),
        |  (array(NULL, 2L), array(NULL, 2L)),
        |  (cast(array() as array<bigint>), array(1L))
        |AS t(mha, mhb)""".stripMargin)
    assertSameRows(
      df.select(HashExpressions.eqCount(col("mha"), col("mhb")).as("c")),
      df.select(expr("size(filter(zip_with(mha, mhb, (x, y) -> x = y), v -> v))").as("c")),
      "eqcount")
  }

  test("pinned divergence: NULL input array -> NULL (SQL forms gave non-null shells)") {
    val df = spark.sql("SELECT cast(NULL as array<bigint>) AS __hs, cast(NULL as array<bigint>) AS __th")
    val r = df.select(
      HashExpressions.minHashSig(col("__hs"), 4, true).as("mh"),
      HashExpressions.simHash(col("__th"), true).as("fp")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    // the SQL shells this replaces (documented in HashExpressions):
    val shell = df.select(
      expr(Dedup.minHashSigSql(4, portable = true)).as("mh"),
      expr(Dedup.simHashSql(portable = true)).as("fp")).collect().head
    assert(!shell.isNullAt(0) && shell.getSeq[Any](0).forall(_ == null))
    assert(shell.getLong(1) == 0L)
  }

  test("kernels run inside whole-stage codegen when their inputs are plain columns") {
    // parquet-backed input: a LocalRelation would be constant-folded into a
    // LocalTableScan by the optimizer, hiding the codegen stage. The plane
    // signature consumes a stored vector column directly, so its stage is
    // whole-stage codegen'd. (The MinHash/SimHash kernels usually sit in a
    // Project NEXT TO the base-hash `transform(...)` HOF, which is
    // CodegenFallback and excludes that Project from WHOLE-STAGE codegen —
    // but the kernel's loop is a compiled static shared by eval and
    // codegen, so its cost is identical on both paths; only the one
    // surrounding projection is interpreted-glued.)
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = vecs
      .withColumn("band", explode(expr("sequence(0, 3)")))
      .select(
        HashExpressions.planeSig(col("embedding"), col("band"), 8, 42L, portable = false).as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` star prefix is the whole-stage-codegen marker on the
    // Project that evaluates the kernel
    assert(
      plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_plane_sig.*"),
      s"expected a codegen-starred Project with the kernel:\n$plan")
    assert(df.count() > 0L)
  }

  test("SQL registration: every kernel reachable from spark.sql text") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        |  graft_minhash(array(7L, 9L), 4, true) AS mh,
        |  graft_simhash(array(7L, 9L), false) AS fp,
        |  graft_plane_sig(array(0.5D, -0.5D), 1, 8, 42L, true) AS sig,
        |  graft_hash_embed(array(7L, 9L), 4, 42L, true) AS emb,
        |  graft_eq_count(array(1L, 2L), array(1L, 3L)) AS c""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getSeq[Any](1).size == 4 && r.getSeq[Any](4).size == 4)
    assert(!r.isNullAt(2) && !r.isNullAt(3))
    assert(r.getInt(5) == 1)
    // config args must be literals — loud error otherwise
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(1L), cast(rand() * 4 as int), true)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("kernels are TOTAL on out-of-domain longs where the ANSI SQL form raises") {
    // arbitrary user input may exceed the portable family's arithmetic
    // domain; the kernel wraps like non-ANSI Spark instead of raising
    val df = spark.sql(
      "SELECT array(9223372036854775807L, -9223372036854775808L) AS a")
    val r = df.select(
      HashExpressions.minHashSig(col("a"), 4, portable = true).as("mh"),
      HashExpressions.simHash(col("a"), portable = true).as("fp")).collect().head
    assert(r.getSeq[Any](0).size == 4)
    assert(!r.isNullAt(1))
  }
}
