package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonIngestSpec extends SparkSpec {

  test("JSONL round-trip is lossless under an explicit schema") {
    val src = Tables.load(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val out = tmpDir("jsonl_rt") + "/nation"
    JsonIngest.writeJsonl(src, out)
    val back = JsonIngest.readJsonl(spark, out, src.schema)
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("schema-on-read: missing fields null out, extra fields are ignored") {
    import spark.implicits._
    val out = tmpDir("jsonl_sor") + "/data"
    Seq("""{"a": 1, "b": "x", "zz_extra": true}""", """{"a": 2}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType)))
    val rows = JsonIngest.readJsonl(spark, out, schema)
      .orderBy("a").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("inferred read recovers integer/string types from clean JSONL") {
    val src = Tables.load(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val out = tmpDir("jsonl_inf") + "/nation"
    JsonIngest.writeJsonl(src, out)
    val inferred = JsonIngest.readJsonlInferred(spark, out)
    assert(inferred.columns.sorted.sameElements(src.columns.sorted))
    assert(inferred.schema("n_nationkey").dataType == LongType)
    assert(inferred.schema("n_name").dataType == StringType)
    assert(inferred.count() == src.count())
  }
}
