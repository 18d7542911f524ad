package graft.core

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Orphan-file vacuum (U4) — the janitor for every parquet state/table root
  * this engine maintains incrementally: the streaming upsert/MV sinks'
  * `bucket=` state ([[graft.streaming.EventsStream]] st8/st9), the streamed
  * dedup index's `batch=` fences (d9/st11), and any compacted/partitioned
  * table root (U1/U3).
  *
  * WHY: those sinks write through rename-based commit protocols — the
  * Hadoop FileOutputCommitter's `_temporary` attempt trees and dynamic
  * partition overwrite's `.spark-staging-*` dirs. A crash mid-job strands
  * the staging tree: invisible to readers (committed data is untouched —
  * that's the point of the protocol) but occupying storage forever, and at
  * 100 TB "forever" is a real bill. Nothing in Spark sweeps a DEAD job's
  * staging debris; production table formats ship a VACUUM for exactly this
  * reason.
  *
  * WHAT is swept (and nothing else):
  *  1. `_temporary` directory trees — committer attempt dirs; live only
  *     while a job is running, debris after a crash.
  *  2. `.spark-staging-*` directories — dynamic-partition-overwrite staging;
  *     same lifecycle.
  *  3. `batch=*` partition directories WITHOUT a `_SUCCESS` marker — the
  *     d9/st11 index writes each ingest batch into its own directory whose
  *     `_SUCCESS` is the commit fence; a fence-less batch dir is a crashed
  *     append (its writer will re-run under the same batch id — the
  *     idempotence contract — so removing the partial leftover is always
  *     safe). SCOPE GUARD: a plain `df.write.partitionBy("batch")` table
  *     commits with ONE `_SUCCESS` at the table ROOT (partition dirs never
  *     get their own) — when the parent directory carries that root-level
  *     marker, its `batch=` children are committed table partitions, not
  *     per-batch index appends, and the fence rule must not apply.
  *
  * Everything is age-gated by `graceMs`: a staging dir younger than the
  * grace window may belong to a LIVE job, so production callers pass hours
  * (specs pass 0). Committed data files are never touched — the sweep
  * decides by path shape and commit markers, never by file content, and a
  * root with no debris is a no-op.
  *
  * Hadoop FileSystem API throughout (same contract as the streaming state
  * probes): works on any supported filesystem, not just local disk.
  */
object Vacuum {

  /** What a [[vacuum]] run removed: directory-tree count, file count, and
    * total bytes (data files only, as reported by the filesystem).
    */
  final case class VacuumReport(
      dirsDeleted: Long, filesDeleted: Long, bytesDeleted: Long) {
    def merge(o: VacuumReport): VacuumReport =
      VacuumReport(dirsDeleted + o.dirsDeleted,
        filesDeleted + o.filesDeleted, bytesDeleted + o.bytesDeleted)
  }
  private val Zero = VacuumReport(0, 0, 0)

  /** Sweep crashed-writer debris under `root`. Returns what was deleted;
    * `dryRun = true` reports without deleting (the audit mode a production
    * run does first).
    */
  def vacuum(
      spark: SparkSession,
      root: String,
      graceMs: Long = 0L,
      dryRun: Boolean = false): VacuumReport = {
    require(graceMs >= 0L, "graceMs must be non-negative")
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Zero else sweep(fs, fs.getFileStatus(p), graceMs, dryRun)
  }

  private def sweep(
      fs: FileSystem, st: FileStatus, graceMs: Long, dryRun: Boolean): VacuumReport = {
    if (!st.isDirectory) Zero
    else {
      val children = fs.listStatus(st.getPath)
      // parent-level commit marker => the batch= children below belong to a
      // plain partitionBy("batch") table (committed as a whole), not to the
      // per-batch-fenced index layout — never fence-gate those
      val parentCommitted =
        children.exists(c => !c.isDirectory && c.getPath.getName == "_SUCCESS")
      children.foldLeft(Zero) { (acc, c) =>
        val name = c.getPath.getName
        val debris =
          c.isDirectory && (
            name == "_temporary" ||
            name.startsWith(".spark-staging-") ||
            (name.startsWith("batch=") && !parentCommitted && !committed(fs, c)))
        if (debris && oldEnough(fs, c, graceMs))
          acc.merge(remove(fs, c, dryRun))
        else if (c.isDirectory)
          acc.merge(sweep(fs, c, graceMs, dryRun))
        else acc
      }
    }
  }

  /** A `batch=` partition dir is committed iff its writer's `_SUCCESS`
    * marker landed — the last file the committer creates.
    */
  private def committed(fs: FileSystem, dir: FileStatus): Boolean =
    fs.exists(new Path(dir.getPath, "_SUCCESS"))

  /** Age gate over the NEWEST modification time in the tree: a tree a live
    * job is still writing into has fresh files, and one stale file in an
    * otherwise-live tree must not doom it.
    */
  private def oldEnough(fs: FileSystem, dir: FileStatus, graceMs: Long): Boolean = {
    if (graceMs == 0L) true
    else {
      val cutoff = System.currentTimeMillis() - graceMs
      newestMtime(fs, dir) <= cutoff
    }
  }

  private def newestMtime(fs: FileSystem, st: FileStatus): Long =
    if (!st.isDirectory) st.getModificationTime
    else (st.getModificationTime +:
      fs.listStatus(st.getPath).map(newestMtime(fs, _)).toSeq).max

  private def remove(fs: FileSystem, dir: FileStatus, dryRun: Boolean): VacuumReport = {
    val r = measure(fs, dir)
    if (!dryRun) fs.delete(dir.getPath, true)
    r
  }

  private def measure(fs: FileSystem, st: FileStatus): VacuumReport =
    if (!st.isDirectory) VacuumReport(0, 1, st.getLen)
    else fs.listStatus(st.getPath)
      .foldLeft(VacuumReport(1, 0, 0))((a, c) => a.merge(measure(fs, c)))
}
