package graft.core

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

/** Small-file compaction — the operational tool every long-lived table
  * needs at scale: streaming sinks (one file per micro-batch per partition),
  * incremental appends and over-parallel writes leave directories of
  * KB-scale part files whose per-file cost (open, footer read, task
  * scheduling — a task minimum is ~100 ms regardless of bytes) eventually
  * dominates scans. At 100 TB an uncompacted events table is millions of
  * tiny files; compacted to ~128 MB parts the same scan schedules thousands
  * of well-fed tasks.
  *
  * Shape: ONE distributed pass — read, round-robin `repartition(n)` where
  * `n = ceil(inputBytes / targetBytes)`, write; the row count is captured
  * from the same execution via `Observation` (no second scan, same
  * mechanism as the export path's counted write). Round-robin, not
  * coalesce: `coalesce(n)` would skip the shuffle but chains upstream
  * parallelism to `n` and inherits input skew; compaction is explicitly
  * ABOUT evening out physical layout, so the shuffle is the point.
  * Date-partitioned layouts compact per partition directory (pass the
  * partition dir as `inDir`), preserving pruning.
  */
object Compaction {

  final case class CompactStats(
      inputFiles: Int, inputBytes: Long, outputFiles: Int, rows: Long)

  val DefaultTargetBytes: Long = 128L << 20

  /** List the data files of a parquet directory (local FS — the test/bench
    * environment; a cluster deployment swaps in a FileSystem listing).
    */
  private def partFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && f.getName.startsWith("part-"))

  /** Compact `inDir`'s parquet files into `outDir` at ~`targetBytes` per
    * output file. Returns the audit stats; the write is atomic-per-directory
    * (overwrite) and row-count-verified by construction (observed count).
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = DefaultTargetBytes): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    // SaveMode.Overwrite deletes outDir BEFORE the lazy read of inDir runs:
    // equal or nested paths would destroy the input instead of compacting
    // it. Canonical paths so symlinked spellings of the same dir are caught.
    val inPath = new java.io.File(inDir).getCanonicalFile.toPath
    val outPath = new java.io.File(outDir).getCanonicalFile.toPath
    require(!outPath.startsWith(inPath) && !inPath.startsWith(outPath),
      s"compaction output must not equal or nest with the input: in=$inPath out=$outPath")
    val files = partFiles(inDir)
    val bytes = files.map(_.length()).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val obs = Observation()
    spark.read.parquet(inDir)
      .observe(obs, count(lit(1)).as("rows"))
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    CompactStats(
      inputFiles = files.length,
      inputBytes = bytes,
      outputFiles = partFiles(outDir).length,
      rows = obs.get("rows").asInstanceOf[Long])
  }
}
