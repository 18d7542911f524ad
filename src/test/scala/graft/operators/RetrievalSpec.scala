package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val queries = docs.filter(col("doc_id") < 5)
    .select(col("doc_id").as("query_id"), col("text").as("qtext"))

  test("bm25TopK: k rows per query, 1-based dense ranks, scores non-increasing") {
    val out = Retrieval.bm25TopK(docs, queries, k = 10).cache()
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 10L))
    val rows = out.orderBy("query_id", "rank").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).toSeq == (1L to 10L),
        "ranks must be exactly 1..k per query")
      val scores = rs.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
    }
  }

  test("bm25TopK ranking follows term frequency on a closed-form corpus") {
    import spark.implicits._
    // doc 1 repeats the query term most in equal-length docs => must rank 1;
    // doc 4 never contains it => must not appear
    val tiny = Seq(
      (1L, "apple apple apple pear pear pear pear pear"),
      (2L, "apple apple pear pear pear pear pear pear"),
      (3L, "apple pear pear pear pear pear pear pear"),
      (4L, "pear pear pear pear pear pear pear pear")
    ).toDF("doc_id", "text")
    val q = Seq((100L, "apple")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(tiny, q, k = 10)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L), s"expected tf-ordered ranking, got $got")
  }

  test("hybridRrfTopK: fused score equals the sum of per-leg reciprocal ranks") {
    val emb = Tables.load(spark, sf, "embeddings")
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    val sparse = Retrieval.bm25TopK(docs, queries, k = 20, excludeSelf = true)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dense = Similarity.topKCosine(emb, ids, k = 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val expected = sparse.unionByName(dense)
      .withColumn("contrib", expr("1000000 div (60 + rank)"))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("rrf_micro"))
    val got = Retrieval.hybridRrfTopK(docs, emb, ids, k = 10)
      .select("query_id", "doc_id", "rrf_micro")
    // every fused row's score must match the independently-derived sum
    assert(got.join(expected, Seq("query_id", "doc_id", "rrf_micro"))
      .count() == got.count())
    // self is excluded from both legs, so it can never be retrieved
    assert(got.filter(col("query_id") === col("doc_id")).isEmpty)
  }

  test("stored-index search is value-identical to the inline BM25 derivation") {
    val path = tmpDir("tindex_once")
    Retrieval.buildTextIndex(docs, path)
    val stored = Retrieval.searchTextIndex(spark, path, queries, k = 10)
    val inline = Retrieval.bm25TopK(docs, queries, k = 10)
    assert(stored.exceptAll(inline).isEmpty && inline.exceptAll(stored).isEmpty,
      "search from the persisted postings diverged from the inline build")
  }

  test("absorbTextIndex: base build + delta append == one-shot build of the union") {
    val deltaPred = "substring(md5(CAST(doc_id AS STRING)), 1, 1) = '0'"
    val base = docs.filter(!expr(deltaPred))
    val delta = docs.filter(expr(deltaPred))
    assert(base.count() > 0 && delta.count() > 0, "fixture slice degenerate")
    val incr = tmpDir("tindex_incr")
    Retrieval.buildTextIndex(base, incr)
    Retrieval.absorbTextIndex(incr, delta, "b1")
    val once = tmpDir("tindex_full")
    Retrieval.buildTextIndex(docs, once)
    val a = spark.read.parquet(s"$incr/postings").drop("batch")
    val b = spark.read.parquet(s"$once/postings").drop("batch")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "incrementally-built postings diverged from the one-shot build")
    // and a retried absorb replaces its own partition, not duplicates it
    // (count captured BEFORE the retry: `a`'s plan pins the old file
    // snapshot, which the overwrite deletes)
    val before = a.count()
    Retrieval.absorbTextIndex(incr, delta, "b1")
    val c = spark.read.parquet(s"$incr/postings").drop("batch")
    assert(c.count() == before, "retried absorb must be idempotent")
  }
}
