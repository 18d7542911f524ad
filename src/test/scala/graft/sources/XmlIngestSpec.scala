package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** XML source/sink (round 20 — S10, the fifth interchange format):
  * rowTag rows, by-name schema-on-read, XML escaping roundtrip, absent
  * elements as nulls.
  */
class XmlIngestSpec extends SparkSpec {

  import spark.implicits._

  test("XML round-trip is lossless, including markup-significant characters (escaping law)") {
    val dir = tmpDir("graft_xml_rt")
    val src = Seq(
      (1L, "a & b", 1.5),
      (2L, "<tag> \"quoted\" 'apos'", -0.25),
      (3L, "plain", 1234567.890123)).toDF("k", "s", "v")
    XmlIngest.writeXml(src, dir)
    val back = XmlIngest.readXml(spark, dir, src.schema)
    assert(back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((1L, "a & b", 1.5), (2L, "<tag> \"quoted\" 'apos'", -0.25),
        (3L, "plain", 1234567.890123)))
    // the part files really are rowTag-framed XML documents
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".xml"))
    assert(f.nonEmpty, "expected .xml part files")
    val body = f.map(x =>
      scala.io.Source.fromFile(x, "UTF-8").mkString).mkString("\n")
    assert(body.contains("<rows>") && body.contains("<row>"), body.take(200))
    assert(body.contains("a &amp; b"), "markup must be escaped on disk")
  }

  test("explicit-schema read matches by NAME; missing fields null-fill; nulls write as absent elements") {
    val dir = tmpDir("graft_xml_evo")
    XmlIngest.writeXml(
      Seq((1L, Some("x")), (2L, None)).toDF("k", "s"), dir)
    // a WIDER read schema: the extra column null-fills by name
    val widened = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("later", LongType)))
    val back = XmlIngest.readXml(spark, dir, widened)
    assert(back.count() == 2L)
    assert(back.filter(col("later").isNotNull).count() == 0L)
    // the null field wrote as an ABSENT element and reads back null
    assert(back.filter(col("s").isNull).select("k")
      .head.getLong(0) == 2L)
    // inference agrees on the populated columns
    val inf = XmlIngest.readXmlInferred(spark, dir)
    assert(inf.columns.toSet == Set("k", "s"))
  }

  test("reads parallelize across FILES (the format's split unit), values exact") {
    val dir = tmpDir("graft_xml_many")
    val src = spark.range(0, 200)
      .select(col("id"), concat(lit("n"), col("id")).as("nm"))
      .repartition(8) // 8 part files = 8 read splits
    XmlIngest.writeXml(src, dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("nm", StringType)))
    val back = XmlIngest.readXml(spark, dir, schema)
    assert(back.rdd.getNumPartitions > 1,
      "a multi-file XML read must parallelize across files")
    assert(back.count() == 200L)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 200L).sum)
  }
}
