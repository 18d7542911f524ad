package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramHashesSpec extends SparkSpec {

  import spark.implicits._

  private def declarative(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("doc_id"), expr(
      s"""CASE WHEN length(text) >= $n
          THEN array_sort(array_distinct(transform(sequence(1, length(text) - ${n - 1}),
               i -> xxhash64(substring(text, i, $n)))))
          ELSE CAST(array() AS ARRAY<BIGINT>) END""").as("sh"))

  test("native gram hashes equal xxhash64(substring) declarative form (corpus)") {
    GraftFunctions.register(spark)
    // non-null filter: the declarative CASE yields an empty array for null
    // text only because length(NULL) is NULL -> ELSE branch; the native
    // expression is null-intolerant (null in -> null out), so compare on
    // the non-null corpus (operators filter nulls before calling it)
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("text").isNotNull)
    val native = docs.select(col("doc_id"),
      expr("graft_ngram_hashes(text, 5)").as("sh"))
    val sql = declarative(docs, 5)
    assert(native.exceptAll(sql).isEmpty && sql.exceptAll(native).isEmpty)
  }

  test("multi-byte (non-ASCII) text takes the exact substring path") {
    GraftFunctions.register(spark)
    val d = Seq((1L, "héllo wörld ünïcode"), (2L, "abcd"), (3L, "abcde"))
      .toDF("doc_id", "text")
    val native = d.select(col("doc_id"), expr("graft_ngram_hashes(text, 5)").as("sh"))
    val sql = declarative(d, 5)
    assert(native.exceptAll(sql).isEmpty && sql.exceptAll(native).isEmpty)
    // short text -> empty; exact-n -> single gram
    val m = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(2L).isEmpty && m(3L).length == 1)
  }

  test("output is sorted ascending and distinct (SortedIntersectSize precondition)") {
    GraftFunctions.register(spark)
    val docs = graft.core.Tables.load(spark, sf, "documents")
    // CASE guard INSIDE the predicate: SQL conjuncts don't short-circuit,
    // and sequence(0, -1) is DESCENDING, so an unguarded exists would index
    // out of bounds (ANSI error) on docs with <= 1 gram
    val bad = docs.filter(col("text").isNotNull)
      .select(expr("graft_ngram_hashes(text, 5)").as("sh"))
      .filter(expr(
        "CASE WHEN size(sh) <= 1 THEN false ELSE " +
          "exists(sequence(0, size(sh) - 2), i -> sh[i] >= sh[i + 1]) END"))
    assert(bad.count() == 0)
  }
}
