package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class OrcIngestSpec extends SparkSpec {

  test("ORC round-trip is lossless, self-described schema matches the source") {
    val src = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val out = tmpDir("orc_rt") + "/customer"
    OrcIngest.writeOrc(src, out)
    val back = OrcIngest.readOrcSelfDescribed(spark, out)
    assert(back.schema == src.schema, "footer schema must reproduce the source")
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("explicit-schema read narrows columns; missing fields null out") {
    val src = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val out = tmpDir("orc_sor") + "/customer"
    OrcIngest.writeOrc(src, out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_missing", StringType)))
    val rows = OrcIngest.readOrc(spark, out, schema)
    assert(rows.schema == schema)
    assert(rows.count() == src.count())
    assert(rows.filter(col("c_missing").isNotNull).count() == 0)
  }

  test("predicate and projection push down to the ORC scan") {
    val src = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val out = tmpDir("orc_push") + "/customer"
    OrcIngest.writeOrc(src, out)
    val q = OrcIngest.readOrcSelfDescribed(spark, out)
      .filter(col("c_custkey") < 100)
      .select("c_custkey", "c_acctbal")
    val scan = q.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PushedFilters: [IsNotNull(c_custkey), LessThan(c_custkey,100)]"),
      s"filter not pushed to the ORC scan:\n$scan")
    assert(scan.contains("struct<c_custkey:bigint,c_acctbal:double>"),
      s"projection not pruned at the ORC scan:\n$scan")
  }
}
