package graft.search

import graft.SparkSpec

class TextSearchSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "A quick brown dog"),
      (3L, "Lazy afternoons, lazy dogs... LAZY!"),
      (4L, "Completely unrelated text about Spark engines"),
      (5L, "fox fox fox"))
      .toDF("doc_id", "text")
  }

  test("tokenizer: lowercase alphanumeric runs (Tantivy simple+lowercase semantics)") {
    import spark.implicits._
    val toks = Seq(("Hello, World! x2 ", "")).toDF("t", "_")
      .select(TextSearch.tokenize(org.apache.spark.sql.functions.col("t")))
      .first().getSeq[String](0)
    assert(toks == Seq("hello", "world", "x2"))
  }

  test("conjunctive search with pagination") {
    val idx = TextSearch.buildIndex(corpus, "doc_id", "text")
    val both = TextSearch.searchAll(idx, Seq("lazy", "dog"), limit = 10, offset = 0)
      .collect().map(_.getLong(0)).toSeq
    assert(both == Seq(1L)) // doc 3 has "dogs", not "dog" — no stemming, like the raw term query
    val page1 = TextSearch.searchAll(idx, Seq("quick"), limit = 1, offset = 0)
      .collect().map(_.getLong(0)).toSeq
    val page2 = TextSearch.searchAll(idx, Seq("quick"), limit = 1, offset = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(page1 == Seq(1L) && page2 == Seq(2L))
  }

  test("keyset pagination walks the same pages as offset, cursor prunes the scan") {
    val idx = TextSearch.buildIndex(corpus, "doc_id", "text")
    val page1 = TextSearch.searchAllAfter(idx, Seq("quick"), limit = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(page1 == Seq(1L))
    val page2 = TextSearch.searchAllAfter(idx, Seq("quick"), limit = 1, afterId = Some(page1.last))
      .collect().map(_.getLong(0)).toSeq
    assert(page2 == Seq(2L))
    val page3 = TextSearch.searchAllAfter(idx, Seq("quick"), limit = 1, afterId = Some(page2.last))
      .collect().map(_.getLong(0)).toSeq
    assert(page3.isEmpty)
    // the cursor is a pushable filter: on a parquet-backed index it must
    // reach the scan as a pushed filter (below the aggregate, below the
    // shuffle), so deep pages prune at the source
    val dir = java.nio.file.Files.createTempDirectory("graft-ts-keyset").toString
    idx.write.mode("overwrite").parquet(dir)
    val diskIdx = spark.read.parquet(dir)
    val physical = TextSearch.searchAllAfter(diskIdx, Seq("quick"), limit = 1, afterId = Some(1L))
      .queryExecution.executedPlan.toString
    assert(
      physical.contains("GreaterThan(id,1)"),
      s"cursor not pushed to the parquet scan:\n$physical")
  }

  test("composite search: property filter + exact/prefix/fuzzy clauses (searcher.rs parity)") {
    import org.apache.spark.sql.functions._
    import TextSearch.TermQuery._
    val docs = corpus.withColumn("lang", when(col("doc_id") <= 3, "en").otherwise("de"))
    val idx = TextSearch.buildIndex(docs, "doc_id", "text")

    // prefix: 'laz*' matches lazy (1, 3)
    val prefix = TextSearch.searchFiltered(docs, "doc_id", idx, Seq(Prefix("laz")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(prefix == Set(1L, 3L))

    // fuzzy: 'fix'~1 matches fox (1, 5)
    val fuzzy = TextSearch.searchFiltered(docs, "doc_id", idx, Seq(Fuzzy("fix", 1)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fuzzy == Set(1L, 5L))

    // conjunction of clauses AND property predicate
    val composite = TextSearch.searchFiltered(
      docs, "doc_id", idx,
      Seq(Exact("quick"), Prefix("bro")),
      propertyFilter = Some(col("lang") === "en"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(composite == Set(1L, 2L))

    // deterministic id pagination
    val page = TextSearch.searchFiltered(
      docs, "doc_id", idx, Seq(Prefix("laz")), limit = 1, offset = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(page == Seq(3L))
  }

  test("BM25 ranking prefers high-tf short docs and rare terms") {
    val idx = TextSearch.buildIndex(corpus, "doc_id", "text")
    val ranked = TextSearch.searchRanked(idx, Seq("fox"), k = 3)
      .collect().map(_.getLong(0)).toSeq
    // doc 5 is all fox (tf=3, len 3); doc 1 mentions it once in a long doc
    assert(ranked == Seq(5L, 1L))
    val lazyDog = TextSearch.searchRanked(idx, Seq("lazy", "dog"), k = 5)
      .collect().map(r => r.getLong(0))
    // docs with either term, ALL of 1,2,3 match at least one
    assert(lazyDog.toSet == Set(1L, 2L, 3L))
  }
}
