package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the third interchange format after CSV and JSONL
  * (SURVEY.md §1.1; the reference's import surface is `.csv`/`.txt` only,
  * `backend/main.py:227-231`). Unlike the text formats, ORC is a columnar
  * container: projection and predicate pushdown reach the stripe reader the
  * same way they reach parquet, so a 2-column read of a 100-column archive
  * scans 2 columns — which makes it the right landing format when data must
  * interchange with Hive-lineage systems rather than parquet-native ones.
  *
  * Same scale posture as [[CsvIngest]]/[[JsonIngest]]: distributed scans
  * (one task per stripe split), executor-parallel part writes, nothing
  * through the driver. Readers take an explicit schema for the same reason
  * JSONL's do — at 100 TB the contract comes from the caller, though ORC
  * files are self-describing (the footer schema is authoritative when the
  * caller passes none).
  */
object OrcIngest {

  /** Write as ORC (executor-parallel part files, snappy by default). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Read ORC with a caller-supplied schema: columns are matched by name,
    * missing ones surface as nulls — the standard schema-on-read contract,
    * with pushdown intact (the schema only narrows the footer's).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Footer-schema variant: ORC is self-describing, so this is a metadata
    * read, not an inference pass over the data (unlike JSONL inference).
    */
  def readOrcSelfDescribed(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
