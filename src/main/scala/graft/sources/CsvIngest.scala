package graft.sources

import graft.api.{IngestError, Validation}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV source/sink — SURVEY.md §2.3 (S1–S5).
  *
  * Import parity target (`/root/reference/backend/main.py:233-239`):
  * `pd.read_csv(..., delimiter=d, dtype=str, na_filter=False)` — header row,
  * configurable single-char delimiter, EVERY value a string, and empty cells
  * are empty strings, never null (na_filter=False also keeps literal "NA"/"NaN"
  * as text).
  *
  * Export parity target (main.py:193-194): `df.to_csv(index=False,
  * encoding='utf-8-sig')` — header from the selected columns, no index column,
  * leading UTF-8 BOM.
  *
  * Scale note: the reference reads the whole upload into driver RAM
  * (main.py:233). Here executors parse file splits in parallel —
  * `spark.read.csv` over a directory of parts is the 100 TB path; the
  * driver-side string APIs below exist only for the reference's small
  * inline-payload contract.
  */
object CsvIngest {

  /** A null sentinel that cannot occur in CSV text: with `nullValue` bound to
    * it, no field ever parses as null, reproducing `na_filter=False`.
    */
  private val NeverNull = "\u0000"

  /** S1 — all-string read (current-source parity: every column String,
    * `""` preserved, "NA" literal). Schema is taken from the header.
    */
  def readAllString(spark: SparkSession, path: String, delimiter: String = ","): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("sep", delimiter)
      .option("nullValue", NeverNull)
      .option("emptyValue", "")
      .csv(path)
    // Header-only or zero-byte files parse to an empty frame — reference
    // rejects with 400 (main.py:241-245).
    if (df.isEmpty) throw IngestError.EmptyFile
    // Unquoted empty fields still surface as null from the univocity parser;
    // with the sentinel bound to nullValue those are the ONLY nulls possible,
    // so filling "" is exactly pandas' na_filter=False.
    df.na.fill("")
  }

  /** S1 (inferred mode) — the old-revision behavior recovered from the
    * reference's `.pyc` (SURVEY.md §8): numeric → Float64/Int64, datetime →
    * DateTime, else String. Spark's schema inference subsumes it.
    */
  def readInferred(spark: SparkSession, path: String, delimiter: String = ","): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("sep", delimiter)
      .option("inferSchema", "true")
      .csv(path)
    if (df.isEmpty) throw IngestError.EmptyFile
    df
  }

  /** Parse an in-memory upload (filename-gated, as main.py:227-231). This is
    * the reference's exact entry shape; prefer [[readAllString]] on a path for
    * anything that doesn't fit in driver memory.
    */
  def parseUpload(
      spark: SparkSession,
      filename: String,
      content: String,
      delimiter: String = ","): DataFrame = {
    if (!Validation.isSupportedFilename(filename)) throw IngestError.UnsupportedFileType
    if (content.trim.isEmpty) throw IngestError.EmptyFile
    // Spill the payload to a temp file and read with multiLine=true so quoted
    // fields containing embedded newlines — valid CSV that the reference's
    // pandas.read_csv accepts (main.py:233-239) — parse as single records
    // instead of being torn across rows by a line pre-split.
    val tmp = java.nio.file.Files.createTempFile("graft_upload_", ".csv")
    try {
      java.nio.file.Files.writeString(tmp, content)
      val df = spark.read
        .option("header", "true")
        .option("sep", delimiter)
        .option("multiLine", "true")
        .option("nullValue", NeverNull)
        .option("emptyValue", "")
        .csv(tmp.toString)
      if (df.isEmpty) throw IngestError.EmptyFile
      // Materialize before the temp file is deleted (small inline payloads
      // by contract — the path-based readers are the at-scale route).
      val rows = df.na.fill("").collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), df.schema)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** S3 — CREATE TABLE IF NOT EXISTS ≈ mode(Ignore) saveAsTable; S4 — batched
    * append ≈ mode(Append). The reference's manual 10k-row insert loop
    * (main.py:273-286) disappears into task partitioning; on a cluster the
    * parallelism is per-file-split, not a driver loop.
    */
  def createIfNotExists(df: DataFrame, table: String): Unit = {
    Validation.requireValidTable(table)
    df.limit(0).write.mode(SaveMode.Ignore).saveAsTable(table)
  }

  def append(df: DataFrame, table: String): Unit = {
    Validation.requireValidTable(table)
    df.write.mode(SaveMode.Append).saveAsTable(table)
  }

  /** Import end-to-end (flatfile→table): ensure table, append rows, return the
    * inserted count — envelope parity with main.py:288-294.
    */
  def importInto(df: DataFrame, table: String): Long = {
    createIfNotExists(df, table)
    append(df, table)
    df.count()
  }

  /** All-string schema helper for symmetric round-trips. */
  def allStringSchema(names: Seq[String]): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  // ----- export side (S5) -----

  /** UTF-8 BOM the reference emits via `encoding='utf-8-sig'` (main.py:194). */
  val Bom = "\uFEFF"

  /** S5 (inline contract) — serialize a SMALL result to one CSV string with
    * header + BOM, matching pandas `to_csv(index=False)` quoting (quote only
    * when a field contains delimiter/quote/newline; quotes double). Collects
    * to the driver by design — callers must pre-limit; the distributed path
    * is [[writeCsv]].
    */
  def toCsvString(df: DataFrame, delimiter: String = ","): String = {
    val d = delimiter
    def cell(v: Any): String = {
      val s = if (v == null) "" else v.toString
      if (s.contains(d) || s.contains("\"") || s.contains("\n") || s.contains("\r"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }
    val header = df.columns.map(cell).mkString(d)
    val body = df.collect().map(_.toSeq.map(cell).mkString(d))
    (Seq(Bom + header) ++ body).mkString("", "\n", "\n")
  }

  /** S5 (distributed) — parallel CSV write; the 100 TB path. Spark never
    * emits a BOM itself; for byte-parity consumers, BOM-prefix the first part
    * via [[bomPrefixParts]] after the write.
    */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ","): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("sep", delimiter)
      .option("emptyValue", "\"\"")
      .csv(path)

  /** Prepend the UTF-8 BOM to every part file of a written CSV directory
    * (each part carries its own header+BOM so any single part is a valid
    * `utf-8-sig` flat file, as downstream pandas consumers expect).
    */
  def bomPrefixParts(path: String): Unit = {
    val dir = new java.io.File(path)
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    parts.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
      if (bytes.length < 3 || bytes(0) != bom(0)) {
        java.nio.file.Files.write(f.toPath, bom ++ bytes)
        // The rewrite invalidates Hadoop LocalFileSystem's sidecar checksum.
        val crc = new java.io.File(f.getParentFile, "." + f.getName + ".crc")
        if (crc.exists()) crc.delete()
      }
    }
  }
}
