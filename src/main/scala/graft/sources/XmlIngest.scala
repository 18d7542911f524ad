package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** XML source/sink — the FIFTH interchange format after CSV, JSONL, ORC
  * and Avro (SURVEY.md §1.1 extension posture): enterprise feeds, sitemap
  * and API dumps still land as XML, and Spark 4 ships the former
  * spark-xml as a BUILT-IN FileFormat (SPARK-44265), so the engine can
  * ingest it with zero new dependencies. XML here is strictly a LANDING
  * format — row-oriented text, not splittable within a document, no
  * column pruning — ingest lands XML, queries run on parquet (the same
  * posture as CSV/JSONL/Avro).
  *
  * Semantics pinned by the spec + the gated key:
  *  - one row per `rowTag` element; fields match child-element NAMES
  *    (schema-on-read: a caller schema narrows and null-fills by name —
  *    the contract every other ingest format carries);
  *  - the writer emits `rootTag`-wrapped part files (executor-parallel,
  *    one file per task like every Spark text sink);
  *  - values roundtrip through XML ESCAPING (`&amp;` etc) — the sink and
  *    source compose to the identity on strings with markup characters;
  *  - `null` fields write as ABSENT elements and read back as null.
  *
  * Scale shape: reads parallelize across FILES (one XML document is one
  * split — the format's inherent limit, stated not hidden), writes are
  * executor-parallel part files; nothing moves through the driver.
  */
object XmlIngest {

  /** One row per element with this tag (both directions). */
  val RowTag = "row"
  val RootTag = "rows"

  /** Write as XML part files under `path` (overwrite). */
  def writeXml(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("rowTag", RowTag).option("rootTag", RootTag)
      .format("xml").save(path)

  /** Read XML with a caller-supplied schema: child elements match by
    * NAME, missing ones null-fill (schema-on-read).
    */
  def readXml(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("rowTag", RowTag).format("xml").load(path)

  /** Inference variant: one schema-discovery pass over the documents
    * (XML is not self-describing — unlike Avro this READS data, so the
    * explicit-schema road is the production one).
    */
  def readXmlInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("rowTag", RowTag).format("xml").load(path)
}
