package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the second "flat file" format after CSV
  * (SURVEY.md §1.1; the reference's import surface is `.csv`/`.txt` only,
  * `backend/main.py:227-231` — JSONL is the natural extension for
  * semi-structured pipeline interchange).
  *
  * Same scale posture as [[CsvIngest]]: reads are distributed file scans
  * (one task per split), writes are executor-parallel part files; nothing
  * transits the driver.
  *
  * Readers take an EXPLICIT schema: JSON schema inference is a full extra
  * pass over the data (and its result is data-dependent) — at the 100 TB
  * point the contract must come from the caller. An inference variant is
  * provided for exploratory use only.
  */
object JsonIngest {

  /** Write as JSON lines (one object per row, executor-parallel parts). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSON lines with a caller-supplied schema — single pass, no
    * inference job; missing fields become nulls, extra fields are ignored
    * (the standard schema-on-read contract).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Inference variant (exploratory): one extra full pass over the files. */
  def readJsonlInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
