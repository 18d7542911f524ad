package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroIngestSpec extends SparkSpec {

  test("Avro round-trip is lossless; the header schema reproduces the source") {
    val src = Tables.load(spark, sf, "supplier")
      .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val out = tmpDir("avro_rt") + "/supplier"
    AvroIngest.writeAvro(src, out)
    val back = AvroIngest.readAvroSelfDescribed(spark, out)
    // Avro primitives are nullable-by-union on write; compare names/types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"header schema must reproduce the source: ${back.schema}")
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("explicit-schema read matches by NAME; missing fields null-fill (Avro evolution)") {
    val src = Tables.load(spark, sf, "supplier")
      .select("s_suppkey", "s_name", "s_acctbal")
    val out = tmpDir("avro_sor") + "/supplier"
    AvroIngest.writeAvro(src, out)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_missing", StringType)))
    val rows = AvroIngest.readAvro(spark, out, schema)
    assert(rows.schema == schema)
    assert(rows.count() == src.count())
    assert(rows.filter(col("s_missing").isNotNull).count() == 0)
  }

  test("Avro reads split by block (parallel scan), and nulls round-trip") {
    val src = Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey"),
        when(col("s_suppkey") % 7 === 0, lit(null: String))
          .otherwise(col("s_name")).as("s_name"))
    val out = tmpDir("avro_nulls") + "/supplier"
    AvroIngest.writeAvro(src, out)
    val back = AvroIngest.readAvro(spark, out, src.schema)
    assert(back.filter(col("s_name").isNull).count() ==
      src.filter(col("s_name").isNull).count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
