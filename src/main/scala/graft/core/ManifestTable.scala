package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal manifest-file commit protocol — cross-partition ATOMICITY for
  * multi-partition state rewrites, the property plain `partitionBy(...)
  * .mode("overwrite")` with dynamic partition overwrite cannot give: that
  * path swaps each partition directory independently, so a crash between
  * two bucket swaps exposes readers to MIXED batch versions until the
  * at-least-once replay heals them ([[graft.streaming.EventsStream]]'s
  * st8 doc names this exact gap and defers to "a merge-capable table
  * format at 100 TB" — this is that table format's core move, reduced to
  * its minimum).
  *
  * The protocol (the heart of every log-structured table format, stripped
  * to one file):
  *  - data files are IMMUTABLE and uniquely named; a writer only ever adds
  *    new files, never rewrites one in place;
  *  - `_manifest/v<N>.json` enumerates the COMPLETE set of data files that
  *    make up version N (one absolute-relative path per line, plus the
  *    batch id that produced it);
  *  - a commit writes its data files, writes the next manifest to a `.tmp`
  *    name, then publishes with ONE `rename` — the atomic commit point
  *    (atomic on local FS and HDFS; object stores need their own atomic
  *    put-if-absent, same slot in the design);
  *  - readers list `_manifest`, pick the highest version, and read exactly
  *    the files it names. A crash anywhere before the rename leaves the
  *    previous version fully intact and the half-written files INVISIBLE —
  *    not mixed state, just dead bytes for [[vacuum]] to sweep.
  *
  * Scale shape: the manifest holds one line per live data file — for a
  * bucketed state table that is O(buckets), a few KB at any data volume;
  * the commit's extra cost over the non-atomic path is one small file
  * write + one rename. Readers pay one small-file read to plan the scan.
  */
object ManifestTable {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifest")

  /** Latest committed version under `root`, or -1 if never committed. */
  def currentVersion(spark: SparkSession, root: String): Long = {
    val dir = manifestDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) -1L
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case VersionRe(v) => v.toLong }
      .foldLeft(-1L)(math.max)
  }

  private val VersionRe = "v(\\d+)\\.json".r

  /** The (relative data-file paths, producing batch id) of a version.
    * Zone-map suffixes (`path|min|max` — see [[commit]]'s `statsCol`) are
    * stripped: callers that plan a full scan see paths only.
    */
  def readManifest(
      spark: SparkSession, root: String, version: Long): (Seq[String], Long) = {
    val (lines, batch, _) = readManifestLines(spark, root, version)
    (lines.map(_.split('|')(0)), batch)
  }

  /** Raw manifest lines (stats suffixes intact) + batch + the registered
    * zone-map column, if any — the carry-forward and pruning shape.
    */
  private def readManifestLines(
      spark: SparkSession, root: String,
      version: Long): (Seq[String], Long, Option[String]) = {
    val p = new Path(manifestDir(root), s"v$version.json")
    val in = fs(spark, p).open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // line 1: {"version":N,"batch":B[,"statsCol":"c"]};
    // following lines: one rel path each, optionally `|min|max` suffixed
    val lines = text.linesIterator.toList
    val batch = "\"batch\":(-?\\d+)".r.findFirstMatchIn(lines.head)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(
        s"malformed manifest header at $p: ${lines.head}"))
    val statsCol = "\"statsCol\":\"([^\"]+)\"".r
      .findFirstMatchIn(lines.head).map(_.group(1))
    (lines.tail.filter(_.nonEmpty), batch, statsCol)
  }

  /** Read the latest committed version as a DataFrame (partition columns
    * like `bucket=` recovered via basePath), or None if never committed.
    * Only manifest-listed files are read — debris from a crashed commit is
    * invisible by construction.
    */
  def read(spark: SparkSession, root: String): Option[DataFrame] = {
    val v = currentVersion(spark, root)
    if (v < 0) None else Some(readVersion(spark, root, v))
  }

  /** TIME TRAVEL: read a specific committed version — every manifest is a
    * complete snapshot and data files are immutable, so any version still
    * inside [[vacuum]]'s retention reads back exactly as committed ("what
    * did the profile table say before yesterday's batch"). Throws if the
    * version's manifest is missing (never committed, or vacuumed away).
    */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val (files, _) = readManifest(spark, root, version)
    if (files.isEmpty)
      spark.read.option("basePath", root).parquet(root).limit(0)
    else spark.read.option("basePath", root)
      .parquet(files.map(f => s"$root/$f"): _*)
  }

  /** Batch id that produced the latest version, or -1 — the exactly-once
    * fence for foreachBatch writers: a redelivered batch id ≤ this is a
    * no-op re-commit.
    */
  def lastBatch(spark: SparkSession, root: String): Long = {
    val v = currentVersion(spark, root)
    if (v < 0) -1L else readManifest(spark, root, v)._2
  }

  /** Commit `touched` (the REPLACEMENT rows for every partition value in
    * its `partitionCol`) against the current version: untouched partitions
    * carry their existing files forward; touched partitions' old files are
    * dropped from the manifest (not deleted — [[vacuum]] owns physical
    * deletion) and replaced by the newly-written ones. Returns the new
    * version.
    *
    * Idempotent per batch: if `batchId` is not greater than the committed
    * [[lastBatch]], the write is skipped entirely (the caller re-delivered
    * a batch that already committed — at-least-once replay).
    */
  def commit(
      spark: SparkSession,
      root: String,
      touched: DataFrame,
      partitionCol: String,
      batchId: Long,
      statsCol: Option[String] = None): Long = {
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val prev = currentVersion(spark, root)
    val prevState =
      if (prev < 0) None else Some(readManifestLines(spark, root, prev))
    if (prevState.exists(batchId <= _._2)) return prev
    // the table's zone-map column is a property of the TABLE, not of one
    // commit: a second writer registering a different column would leave
    // the manifest with suffixes meaning two different things. Validate
    // BEFORE the data write — a refusal must cost nothing and leave no
    // orphan files in live partition dirs.
    val prevStatsCol = prevState.flatMap(_._3)
    val effStatsCol = (statsCol, prevStatsCol) match {
      case (Some(a), Some(b)) =>
        require(a == b,
          s"zone-map column mismatch: table has '$b', commit passed '$a'")
        Some(a)
      case (a, b) => a.orElse(b)
    }
    val next = prev + 1
    // 1. data files: write the touched partitions into a version-private
    //    staging dir (unique names by construction), then move each file
    //    under its partition dir with a version-prefixed name. Files are
    //    never overwritten — versions share a dir but not files.
    val stage = new Path(rootPath, s"_stage-v$next")
    touched.write.partitionBy(partitionCol).mode("overwrite")
      .parquet(stage.toString)
    val touchedParts = scala.collection.mutable.ListBuffer[String]()
    val newFiles = scala.collection.mutable.ListBuffer[String]()
    for (partDir <- f.listStatus(stage) if partDir.isDirectory) {
      val partName = partDir.getPath.getName // e.g. bucket=3
      // '|' is the manifest's stats delimiter (U6): a partition VALUE
      // containing it (Spark does not escape '|' in partition dir names)
      // would truncate to a nonexistent path on read and make vacuum
      // treat the real file as dead. Refuse before any file moves.
      require(!partName.contains('|'),
        s"partition value '$partName' contains '|' (the manifest stats " +
          "delimiter) — choose a '|'-free partition value")
      touchedParts += partName
      val dest = new Path(rootPath, partName)
      f.mkdirs(dest)
      for (df0 <- f.listStatus(partDir.getPath)
           if df0.isFile && !df0.getPath.getName.startsWith("_")
             && !df0.getPath.getName.startsWith(".")) {
        val name = s"v$next-${df0.getPath.getName}"
        if (!f.rename(df0.getPath, new Path(dest, name)))
          throw new IllegalStateException(
            s"could not stage data file ${df0.getPath} -> $dest/$name")
        newFiles += s"$partName/$name"
      }
    }
    f.delete(stage, true)
    // 2. the new manifest: carry forward every untouched partition's LINES
    //    (zone-map suffixes ride along — data files are immutable, so a
    //    file's stats can never go stale)
    val carried: Seq[String] = prevState match {
      case None => Seq.empty
      case Some((lines, _, _)) =>
        lines.filterNot(l => touchedParts.exists(tp => l.startsWith(tp + "/")))
    }
    // 2b. zone maps for the NEW files: exact per-file (min, max) straight
    //     from the parquet FOOTERS the write just produced — metadata-only
    //     reads (the a22/a25 footer discipline), no data scan. A file
    //     whose footer carries no usable stats for the column gets a bare
    //     line — readers keep it conservatively.
    val newLines = effStatsCol match {
      case None => newFiles.toList
      case Some(c) => newFiles.toList.map { rel =>
        footerStats(spark, new Path(rootPath, rel), c) match {
          case Some((mn, mx)) => s"$rel|$mn|$mx"
          case None => rel
        }
      }
    }
    val header = s"""{"version":$next,"batch":$batchId""" +
      effStatsCol.map(c => s""","statsCol":"$c"""").getOrElse("") + "}"
    val body = (header +: (carried ++ newLines).sorted).mkString("\n")
    // 3. publish: tmp write + ONE rename — the atomic commit point
    val mDir = manifestDir(root)
    f.mkdirs(mDir)
    // overwrite=true: a stale tmp is a CRASHED attempt at this same version
    // slot (single writer per root) — recovery must supersede it; the
    // rename below stays the one atomic commit point
    val tmp = new Path(mDir, s"v$next.json.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, new Path(mDir, s"v$next.json")))
      throw new IllegalStateException(
        s"manifest publish lost the race for version $next under $root")
    next
  }

  /** Exact (min, max) of an integer column from a parquet file's FOOTER —
    * metadata-only, no row is read. None when the column is absent, not an
    * integer type, or any row group lacks stats (readers must then keep
    * the file conservatively — pruning may only ever drop files PROVEN
    * row-free for the predicate).
    */
  private def footerStats(
      spark: SparkSession, file: Path, column: String): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(file, spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val perBlock = reader.getFooter.getBlocks.asScala.toList.map { b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .flatMap { c =>
            c.getStatistics match {
              case s: org.apache.parquet.column.statistics.LongStatistics
                  if !s.isEmpty && s.hasNonNullValue =>
                Some((s.getMin, s.getMax))
              case s: org.apache.parquet.column.statistics.IntStatistics
                  if !s.isEmpty && s.hasNonNullValue =>
                Some((s.getMin.toLong, s.getMax.toLong))
              case _ => None
            }
          }
      }
      if (perBlock.isEmpty || perBlock.exists(_.isEmpty)) None
      else Some((perBlock.flatten.map(_._1).min, perBlock.flatten.map(_._2).max))
    } finally reader.close()
  }

  /** ZONE-MAP file pruning (U6 — the manifest-resident data-skipping move
    * of every log-structured table format): the relative paths of the
    * latest version's files whose recorded [min, max] for the registered
    * `statsCol` INTERSECTS [lo, hi], plus the version's total file count.
    * Files without recorded stats are kept (conservative); a column other
    * than the registered one refuses loudly rather than pruning on
    * meaningless bounds. At 100 TB this is the difference between
    * planning a scan from one small manifest read and listing/opening
    * every file: the manifest already knows which files can matter.
    */
  def prunedFiles(
      spark: SparkSession,
      root: String,
      column: String,
      lo: Long,
      hi: Long): (Seq[String], Int) = {
    require(lo <= hi, s"empty predicate interval [$lo, $hi]")
    val v = currentVersion(spark, root)
    require(v >= 0, s"no committed version under $root")
    val (lines, _, statsCol) = readManifestLines(spark, root, v)
    require(statsCol.contains(column),
      s"zone maps under $root are for ${statsCol.getOrElse("<none>")}, " +
        s"not '$column' — prune on the registered column or re-commit with it")
    val kept = lines.flatMap { l =>
      l.split('|') match {
        case Array(p, mn, mx) =>
          if (mx.toLong >= lo && mn.toLong <= hi) Some(p) else None
        case parts => Some(parts(0)) // no stats recorded: keep
      }
    }
    (kept, lines.length)
  }

  /** Read the latest version restricted to files that can contain rows
    * with `column` in [lo, hi] — a SUPERSET of the matching rows (the
    * PushedFilters contract: the caller still applies the row filter; the
    * zone maps only bound which FILES are opened).
    */
  def readPruned(
      spark: SparkSession,
      root: String,
      column: String,
      lo: Long,
      hi: Long): DataFrame = {
    val (files, _) = prunedFiles(spark, root, column, lo, hi)
    if (files.isEmpty)
      readVersion(spark, root, currentVersion(spark, root)).limit(0)
    else spark.read.option("basePath", root)
      .parquet(files.map(f => s"$root/$f"): _*)
  }

  /** Physical deletion of data files no RETAINED version needs: "live" is
    * the UNION of the file lists of every manifest inside the retention
    * window (versions > v - keepVersions), not just the newest one — time
    * travel back to any retained version must keep working after a vacuum,
    * so a file is only dead once no retained snapshot references it.
    * Also sweeps crashed-commit `_stage-v*` staging dirs (a crash between
    * the staged write and its cleanup strands one; nothing else deletes
    * it) plus manifests older than the latest `keepVersions`. Grace-gated
    * like [[Vacuum]] — a file younger than `graceMs` may belong to an
    * in-flight commit.
    */
  def vacuum(
      spark: SparkSession,
      root: String,
      keepVersions: Int = 1,
      graceMs: Long = 0L): Long = {
    require(keepVersions >= 1, "must keep at least the current version")
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val v = currentVersion(spark, root)
    if (v < 0) return 0L
    val retainedVersions = (math.max(0L, v - keepVersions + 1) to v)
      .filter(rv => f.exists(new Path(manifestDir(root), s"v$rv.json")))
    val live: Set[String] =
      retainedVersions.flatMap(rv => readManifest(spark, root, rv)._1).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0L
    for (partDir <- f.listStatus(rootPath)
         if partDir.isDirectory && partDir.getPath.getName.contains("=")) {
      val partName = partDir.getPath.getName
      for (df0 <- f.listStatus(partDir.getPath) if df0.isFile) {
        val rel = s"$partName/${df0.getPath.getName}"
        if (!live.contains(rel) && df0.getModificationTime <= cutoff) {
          f.delete(df0.getPath, false); deleted += 1
        }
      }
    }
    // crashed-commit staging debris: `_stage-v<N>` survives only if the
    // writer died between its parquet write and the post-move cleanup —
    // by then every file the commit published has been renamed OUT of it,
    // so an age-gated recursive delete can never touch live data
    for (d <- f.listStatus(rootPath)
         if d.isDirectory && d.getPath.getName.startsWith("_stage-") &&
           d.getModificationTime <= cutoff) {
      f.delete(d.getPath, true); deleted += 1
    }
    // expired manifests (never the newest keepVersions)
    val mDir = manifestDir(root)
    for (m <- f.listStatus(mDir)) m.getPath.getName match {
      case VersionRe(n) if n.toLong <= v - keepVersions &&
        m.getModificationTime <= cutoff =>
        f.delete(m.getPath, false); deleted += 1
      case _ => ()
    }
    deleted
  }
}
