package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordShingleHashesSpec extends SparkSpec {

  import spark.implicits._

  private def declarative(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val combineArgs = (0 until n)
      .map(j => s"element_at(th, i + ${j + 1})").mkString(", ")
    df
      .select(col("doc_id"),
        expr("transform(split(text, ' '), w -> xxhash64(w))").as("th"))
      .filter(size(col("th")) >= n)
      .select(col("doc_id"), expr(
        s"array_sort(array_distinct(transform(sequence(0, size(th) - $n), i -> xxhash64($combineArgs))))")
        .as("sh"))
  }

  test("native word shingles equal the chained-xxhash64 declarative form") {
    GraftFunctions.register(spark)
    // the declarative form FILTERS short/null docs out while the native
    // expression emits empty arrays (null for null text) — compare on the
    // common domain, exactly how the operator consumes it (size > 0)
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("text").isNotNull)
    val native = docs.select(col("doc_id"),
      expr("graft_word_shingles(text, 3)").as("sh"))
      .filter(size(col("sh")) > 0)
    val sql = declarative(docs, 3)
    assert(native.exceptAll(sql).isEmpty && sql.exceptAll(native).isEmpty)
  }

  test("short docs yield empty; unicode tokens and empty tokens hash identically") {
    GraftFunctions.register(spark)
    val d = Seq((1L, "a b"), (2L, "héllo  wörld über x"), (3L, "p q r"))
      .toDF("doc_id", "text")
    val native = d.select(col("doc_id"), expr("graft_word_shingles(text, 3)").as("sh"))
    val m = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(1L).isEmpty && m(3L).length == 1)
    val sql = declarative(d, 3)
    assert(native.filter(size(col("sh")) > 0).exceptAll(sql).isEmpty &&
      sql.exceptAll(native.filter(size(col("sh")) > 0)).isEmpty)
  }
}
