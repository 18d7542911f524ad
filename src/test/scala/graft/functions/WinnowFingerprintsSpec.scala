package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowFingerprintsSpec extends SparkSpec {

  import spark.implicits._

  /** The declarative SQL formulation the native expression replaced. */
  private def declarative(docs: org.apache.spark.sql.DataFrame, w: Int) = {
    val hashSeq =
      """CASE WHEN size(split(text, ' ')) >= 3
          THEN transform(sequence(0, size(split(text, ' ')) - 3),
               i -> md5(array_join(slice(split(text, ' '), i + 1, 3), ' ')))
          ELSE CAST(array() AS ARRAY<STRING>) END"""
    docs
      .select(col("doc_id"), expr(hashSeq).as("hs"))
      .filter(size(col("hs")) >= w)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(hs) - $w + 1), j -> array_min(slice(hs, j, $w))))"))
        .as("fp"))
  }

  test("native winnow equals the declarative SQL formulation on the corpus") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val native = graft.operators.TextAnalysis.winnow(docs)
    val sql = declarative(docs, 4)
    assert(native.exceptAll(sql).isEmpty && sql.exceptAll(native).isEmpty)
  }

  test("edge cases: short docs, exact-w docs, repeated-shingle runs") {
    val d = Seq(
      (1L, "one two three"),                       // 1 shingle < w -> none
      (2L, "a b c d e f"),                          // 4 shingles = w -> 1 window
      (3L, "x y z x y z x y z x y z"),              // repetition -> few distinct
      (4L, "solo"),                                 // no shingles
      (5L, "p q  r s t u v")                        // double space token
    ).toDF("doc_id", "text")
    val native = graft.operators.TextAnalysis.winnow(d)
    val sql = declarative(d, 4)
    assert(native.exceptAll(sql).isEmpty && sql.exceptAll(native).isEmpty)
    assert(native.filter(col("doc_id").isin(1L, 4L)).count() == 0)
    assert(native.filter(col("doc_id") === 2L).count() == 1)
  }
}
