package graft.core

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{Observation, SaveMode, SparkSession}
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
  *
  * All listings and size probes go through the Hadoop FileSystem API — a
  * `java.io.File` listing silently returns nothing on HDFS/object storage
  * and would report "0 input files" forever (the silent-degradation mode
  * the engine's Hadoop-FS rule forbids).
  */
object Compaction {

  final case class CompactStats(
      inputFiles: Int, inputBytes: Long, outputFiles: Int, rows: Long)

  val DefaultTargetBytes: Long = 128L << 20

  private def partFiles(
      f: FileSystem, dir: Path): Seq[FileStatus] =
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))

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
    // it. Compare fully-qualified URIs; local paths additionally resolve
    // symlinked spellings of the same dir via canonicalization.
    val conf = spark.sparkContext.hadoopConfiguration
    val inP = new Path(inDir)
    val f = inP.getFileSystem(conf)
    def qualified(d: String): String = {
      val p = new Path(d)
      val q = p.getFileSystem(conf).makeQualified(p)
      if (q.toUri.getScheme == "file")
        new Path("file://" +
          new java.io.File(q.toUri.getPath).getCanonicalPath).toString
      else q.toString
    }
    val (inQ, outQ) = (qualified(inDir), qualified(outDir))
    require(!(outQ + "/").startsWith(inQ + "/") &&
      !(inQ + "/").startsWith(outQ + "/"),
      s"compaction output must not equal or nest with the input: in=$inQ out=$outQ")
    val files = partFiles(f, inP)
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val obs = Observation()
    spark.read.parquet(inDir)
      .observe(obs, count(lit(1)).as("rows"))
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    val outP = new Path(outDir)
    CompactStats(
      inputFiles = files.length,
      inputBytes = bytes,
      outputFiles = partFiles(outP.getFileSystem(conf), outP).length,
      rows = obs.get("rows").asInstanceOf[Long])
  }
}
