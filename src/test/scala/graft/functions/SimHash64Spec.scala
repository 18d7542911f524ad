package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHash64Spec extends SparkSpec {

  import spark.implicits._

  /** The SQL formulation the native expression replaced (and the DuckDB
    * oracle still runs): md5 per distinct token, nibble unpack, per-bit sums.
    */
  private def declarative(docs: org.apache.spark.sql.DataFrame) =
    docs
      .select(col("doc_id").as("id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h", md5(col("w")))
      .select(col("id"), posexplode(expr(
        "transform(sequence(0, 15), i -> CAST(conv(substring(h, i + 1, 1), 16, 10) AS INT))"))
        .as(Seq("np", "nib")))
      .select(col("id"), col("np"), col("nib"), explode(expr("sequence(0, 3)")).as("k"))
      .withColumn("pos", expr("np * 4 + k"))
      .withColumn("contrib", expr("2 * (shiftright(nib, 3 - k) & 1) - 1"))
      .groupBy(col("id"), col("pos"))
      .agg(sum("contrib").as("s"))
      .withColumn("bit", when(col("s") >= 0, lit("1")).otherwise(lit("0")))
      .groupBy(col("id"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(pos, bit))), x -> x.bit)"), "")
        .as("simhash"))
      .select(col("id").as("doc_id"), col("simhash"))

  test("native simhash is bit-identical to the declarative SQL formulation") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val native = graft.operators.Dedup.simHash(docs)
    val sql = declarative(docs)
    assert(native.exceptAll(sql).isEmpty && sql.exceptAll(native).isEmpty)
    assert(native.filter(!col("simhash").rlike("^[01]{64}$")).count() == 0)
  }

  test("edge tokenization: trailing/double spaces and repeats match the SQL form") {
    val d = Seq(
      (1L, "a b "),        // trailing empty token must be KEPT
      (2L, "a  b"),        // double space -> empty middle token
      (3L, "x x x y"),     // repeats deduped before accumulation
      (4L, "solo")
    ).toDF("doc_id", "text")
    val native = graft.operators.Dedup.simHash(d)
    val sql = declarative(d)
    assert(native.exceptAll(sql).isEmpty && sql.exceptAll(native).isEmpty)
    // dedup invariance: repeated tokens don't shift the fingerprint
    val once = graft.operators.Dedup.simHash(Seq((9L, "x y")).toDF("doc_id", "text"))
      .select("simhash").head().getString(0)
    val thrice = graft.operators.Dedup.simHash(Seq((9L, "x x y x")).toDF("doc_id", "text"))
      .select("simhash").head().getString(0)
    assert(once == thrice)
  }
}
