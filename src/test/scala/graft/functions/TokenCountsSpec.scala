package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenCountsSpec extends SparkSpec {

  import spark.implicits._

  test("graft_token_counts equals explode-split groupBy counting") {
    GraftFunctions.register(spark)
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val native = docs.select(col("doc_id"),
      explode(expr("graft_token_counts(text)")).as(Seq("token", "c")))
      .select(col("doc_id"), col("token"), col("c").cast("long").as("c"))
    val declarative = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    assert(native.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(native).isEmpty)
  }

  test("tokenization keeps empty tokens; counts are exact") {
    GraftFunctions.register(spark)
    val d = Seq((1L, "a b  a b a ")).toDF("doc_id", "text")
    val m = d.select(expr("graft_token_counts(text)").as("m"))
      .head().getMap[String, Int](0)
    assert(m("a") == 3 && m("b") == 2 && m("") == 2) // double space + trailing
  }
}
