package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the LLM-data pipeline (north-star
  * extension): media as opaque `binary` columns with typed metadata, plus
  * deterministic feature-extraction / frame-sampling over them.
  *
  * The REAL decode step (JPEG/PNG/audio/video codecs) is stubbed — the
  * container provisions no media libraries (see [[decodeStub]]). Everything
  * around the stub is production-shaped and tested: binary column handling
  * (`substring`/`md5`/`hex`/`octet_length` over BinaryType), a typed
  * metadata struct, fixed-size chunking ("frame sampling") via sequence +
  * explode, and map-only distribution — at 100 TB each media blob is
  * processed where it lives; nothing but features crosses a shuffle.
  *
  * In a real deployment decode/resize/feature-extract would be an
  * Arrow-vectorized batch UDF (Python `mapInPandas` or a JVM codec) slotted
  * exactly where [[decodeStub]] sits; the schema, partitioning, and batch
  * shape here are what that UDF would see.
  */
object Multimodal {

  /** Bytes per "frame" in the chunked sampling below. */
  val FrameBytes = 256

  /** Derive a deterministic media table from `documents`: the text bytes
    * stand in for an encoded payload (binary), `kind` fans the rows across
    * the three modalities, and `meta` carries provenance as a typed struct.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      expr("CASE pmod(doc_id, 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        col("lang").as("orig_lang"),
        col("source").as("orig_source"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** DECODE STUB — deterministic fake in place of a real media decoder.
    * Produces plausible (width, height, channels) purely from the byte
    * length so tests and plans are stable; a real build replaces this one
    * expression with a codec call (see object doc).
    */
  def decodeStub(media: DataFrame): DataFrame =
    media.withColumn("decoded", expr(
      """struct(
        |  CAST(16 + pmod(octet_length(content), 1024) AS BIGINT) AS width,
        |  CAST(16 + pmod(octet_length(content) * 7, 1024) AS BIGINT) AS height,
        |  3L AS channels)""".stripMargin))

  /** Per-media features: size, content hash, sniffed header bytes, chunk
    * count, a sampled mid-"frame" hash, and the stub-decoded dimensions.
    * One map-only pass over the binary column.
    */
  def mediaFeatures(media: DataFrame): DataFrame =
    decodeStub(media).select(
      col("media_id"),
      col("kind"),
      expr("CAST(octet_length(content) AS BIGINT)").as("n_bytes"),
      expr("md5(content)").as("content_md5"),
      expr(s"hex(substring(content, 1, 8))").as("header_hex"),
      expr(s"CAST(ceil(octet_length(content) / ${FrameBytes}.0) AS BIGINT)").as("n_frames"),
      expr(s"md5(substring(content, CAST(ceil(octet_length(content) / ${FrameBytes}.0) AS INT) div 2 * $FrameBytes + 1, $FrameBytes))")
        .as("mid_frame_md5"),
      col("decoded.width").as("width"),
      col("decoded.height").as("height"))

  /** Frame sampling: explode each media blob into fixed-size chunks with
    * per-frame offsets and hashes — the distributed shape for per-frame
    * model inference (each frame row is independently schedulable).
    */
  def frameSample(media: DataFrame, frameBytes: Int = FrameBytes): DataFrame =
    media
      .select(
        col("media_id"),
        col("content"),
        expr(s"CAST(ceil(octet_length(content) / ${frameBytes}.0) AS INT)").as("nf"))
      // nf >= 1 guard: Spark's sequence(0, -1) is the DESCENDING [0, -1],
      // not empty — zero-byte media must yield zero frames
      .filter(col("nf") > 0)
      .select(
        col("media_id"),
        explode(expr("sequence(0, nf - 1)")).as("frame_idx"),
        col("content"))
      .select(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        expr(s"CAST(frame_idx * $frameBytes + 1 AS BIGINT)").as("frame_offset"),
        expr(s"md5(substring(content, frame_idx * $frameBytes + 1, $frameBytes))").as("frame_md5"))
}
