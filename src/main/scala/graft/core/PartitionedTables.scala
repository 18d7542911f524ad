package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned table layout — the on-disk shape the flat sf dirs would
  * actually have at 100 TB.
  *
  * A day of events at that scale is hundreds of GB; every production query
  * carries a time predicate, and the only way a scan over months of data
  * stays proportional to the queried window is HIVE-STYLE PARTITION PRUNING:
  * `.../event_date=2024-01-08/part-*.parquet` directories, with Catalyst
  * turning `WHERE event_date BETWEEN x AND y` into a directory-listing
  * filter (`PartitionFilters` in the scan node) so non-matching partitions
  * are never opened — not even their footers. PlanSpec pins exactly that:
  * the pruned scan plans with a non-empty PartitionFilters and reads only
  * the selected fraction of partitions.
  *
  * The flat testdata dirs are read-only, so the partitioned copy is staged
  * once per (dir) under a scratch root; at a real deployment the table is
  * WRITTEN this way and [[eventsByDate]] is just `spark.read.parquet(root)`.
  */
object PartitionedTables {

  private val staged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Root of the date-partitioned copy of `dir`/events.parquet (staged on
    * first use, memoized per JVM). One file per partition: `repartition` on
    * the partition column before the write, so a 30-day window is 30 files,
    * not 30 × shuffle-partitions splinters (the classic small-file trap).
    */
  def eventsByDateRoot(spark: SparkSession, dir: String): String =
    staged.computeIfAbsent(dir, _ => {
      val out = TempDirs.create("graft_part_events_")
      writePartitioned(spark, dir, out)
      out
    })

  /** Write the date-partitioned copy of `dir`/events.parquet under `out`
    * (the memoized staging above, exposed so callers — and the retention
    * spec — can build a private, mutable copy).
    */
  def writePartitioned(spark: SparkSession, dir: String, out: String): Unit =
    Tables.load(spark, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write.partitionBy("event_date").mode("overwrite").parquet(out)

  /** Number of staged partitioned copies currently memoized (diagnostic —
    * Engine release hooks are pinned empty by EngineSpec).
    */
  def stagedCount: Int = staged.size

  /** Drop every staged partitioned copy and reclaim its scratch space now
    * (otherwise reclaimed only at JVM exit). Outstanding frames over a
    * dropped copy become unreadable — callers release between workloads,
    * not mid-query (Engine.releaseCachedState's existing contract).
    */
  def releaseStaged(): Unit = {
    // values() is a live view — copy before clear or there is nothing to drop
    val paths = new java.util.ArrayList(staged.values())
    staged.clear()
    paths.forEach(TempDirs.drop(_))
  }

  /** The partitioned events table. `event_date` is a partition column —
    * predicates on it prune directories, not rows.
    */
  def eventsByDate(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(eventsByDateRoot(spark, dir))

  /** Daily per-type rollup over a date window — the canonical pruned-scan
    * query: the window predicate lands in PartitionFilters (directory
    * pruning), and the aggregate is one partial-then-final shuffle keyed by
    * (event_date, event_type).
    */
  /** TTL retention over a date-partitioned root: drop every
    * `event_date=<d>` partition with `d` strictly before `cutoff`
    * (ISO date). Returns the number of partitions dropped.
    *
    * This is the 100 TB retention shape: deleting expired data is a
    * DIRECTORY operation — O(partitions) metadata work, zero data read or
    * rewritten — which is the entire argument for partitioning by the
    * retention axis. A delete expressed as `WHERE ts >= cutoff` over a flat
    * layout would rewrite the surviving 100 TB to drop a day.
    *
    * Only direct children matching the `event_date=` partition pattern with
    * a parseable date are candidates; anything else (data files, `_SUCCESS`,
    * malformed names) is left untouched.
    */
  def dropPartitionsBefore(root: String, cutoff: String): Int = {
    val cut = java.time.LocalDate.parse(cutoff)
    // Hadoop FileSystem, not java.io.File: the retention sweep must work
    // on whatever filesystem the table lives on — a local-only listing
    // would silently find zero partitions on HDFS/object storage and
    // report "nothing expired" forever
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val f = rootPath.getFileSystem(
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration()))
    val children =
      if (!f.exists(rootPath)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else f.listStatus(rootPath)
    val expired = children.filter { s =>
      s.isDirectory && s.getPath.getName.startsWith("event_date=") &&
        (try {
          java.time.LocalDate
            .parse(s.getPath.getName.stripPrefix("event_date=")).isBefore(cut)
        } catch { case _: java.time.format.DateTimeParseException => false })
    }
    // retention on durable data must SURFACE a failed delete, not count it
    // as dropped — a partition that survives the sweep would silently
    // re-count next run and the "expired data removed" log would be a lie
    val survivors = expired.filter { s =>
      f.delete(s.getPath, true)
      f.exists(s.getPath)
    }
    if (survivors.nonEmpty)
      throw new java.io.IOException(
        s"retention could not delete ${survivors.length} partition(s): " +
          survivors.map(_.getPath.getName).mkString(", "))
    expired.length
  }

  def dailyRollup(
      spark: SparkSession,
      dir: String,
      from: String,
      to: String): DataFrame =
    eventsByDate(spark, dir)
      .filter(col("event_date").between(lit(from).cast("date"), lit(to).cast("date")))
      .groupBy(col("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 1000) AS BIGINT)")).as("value_milli"))
}
