package graft.core

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

/** OPTIMIZE for the streamed index artifacts — the operational companion of
  * the `batch=<id>` absorb fence ([[graft.operators.VectorIndex.absorb]],
  * [[graft.operators.Dedup.appendToIndex]],
  * [[graft.operators.Retrieval.absorbTextIndex]],
  * [[graft.operators.TextAnalysis.absorbHeavyHitters]]).
  *
  * Each absorb lands one hive partition per ingest micro-batch, which is
  * exactly right for exactly-once retries but accumulates UNBOUNDEDLY: after
  * 10⁴ micro-batches every search lists 10⁴ directories and schedules 10⁴
  * footer reads before a byte of useful work — the small-file death every
  * streamed table format (Delta/Iceberg OPTIMIZE, Hudi compaction) exists to
  * prevent. All four artifacts' relations are row-level append-only (search
  * semantics depend only on the UNION of rows, never on which batch a row
  * arrived in — spec-pinned per artifact), so compaction is pure physical
  * re-layout: fold every `batch=*` partition of a relation into one
  * consolidated `batch=__opt__` partition at ~targetBytes per file.
  *
  * Retry contract across the fold: a batch id whose rows were folded no
  * longer has its own partition, so a late retried absorb (crash between
  * absorb and the stream checkpoint commit) would RE-ADD its rows as a fresh
  * partition and silently duplicate the index. The marker file
  * `_folded_batches` at the artifact root (one id per line, written
  * atomically BEFORE any partition is rewritten) closes that hole: absorb
  * implementations consult [[isFolded]] and no-op on a folded id — correct
  * in every crash ordering, because the marker is written only when the
  * batch's rows are durably present (either still in their own partition or
  * already consolidated).
  *
  * Crash windows, argued in write order:
  *  - after marker, before rewrite: batch dirs intact, marker says folded —
  *    absorb no-ops are still correct (rows present); the next optimize
  *    finishes the fold.
  *  - between the two directory renames of the swap: the relation dir is
  *    briefly absent — a concurrent reader fails LOUDLY (no silent partial
  *    result) and the complete consolidated data sits in `<rel>__optnext`
  *    for manual recovery. On a cluster this window is closed by a manifest
  *    commit ([[ManifestTable]]); for the local-FS artifact layout two
  *    atomic renames with loud failure is the honest equivalent.
  *
  * MUST run from the same maintenance loop that runs absorbs (e.g. after
  * the absorb inside `foreachBatch`) or at a quiet point — folding a
  * PARTIALLY-written batch of an in-flight absorb would mark it folded and
  * lose its retry. The streamed replay paths in [[graft.streaming
  * .EventsStream]] satisfy this by construction (one writer, serial
  * micro-batches).
  */
object IndexOptimize {

  final case class RelOptStats(
      rel: String,
      inputBatches: Int,
      inputFiles: Int,
      outputFiles: Int,
      rows: Long)

  /** Partition value of the consolidated batch. Reserved: absorb callers
    * must never use it as an ingest batch id.
    */
  val FoldedPartition = "__opt__"

  private val MarkerName = "_folded_batches"

  /** Batch ids whose rows have been folded into the consolidated partition
    * (empty set when the artifact has never been optimized). Underscore
    * prefix keeps the marker invisible to Spark's file listing.
    */
  def foldedBatches(root: String): Set[String] = {
    val f = new File(root, MarkerName)
    if (!f.isFile) Set.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSet
  }

  /** The absorb-side fence: true iff `batchId`'s rows are already present
    * in the consolidated partition, so a retried absorb must no-op.
    */
  def isFolded(root: String, batchId: String): Boolean =
    foldedBatches(root).contains(batchId)

  private def writeMarker(root: String, ids: Set[String]): Unit = {
    val dir = new File(root)
    require(dir.isDirectory, s"artifact root $root is not a directory")
    val tmp = new File(dir, MarkerName + ".tmp")
    Files.write(tmp.toPath,
      ids.toSeq.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, new File(dir, MarkerName).toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def batchDirs(relDir: File): Seq[File] =
    Option(relDir.listFiles()).getOrElse(Array.empty[File]).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))

  private def partFiles(dir: File): Seq[File] =
    Option(dir.listFiles()).getOrElse(Array.empty[File]).toSeq
      .filter(f => f.isFile && f.getName.startsWith("part-"))

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Recovery for the documented mid-swap crash window: a crash between
    * the two renames leaves the relation directory ABSENT while its
    * complete consolidated data sits in `<rel>__optnext` (and possibly the
    * superseded tree in `<rel>__optold`). Readers fail loudly in that
    * state; this call finishes the swap — promote `__optnext` to the live
    * name, drop `__optold` — and is a no-op for healthy relations.
    * Returns the relations it repaired. Run it before serving an artifact
    * whose optimize may have crashed; [[optimize]] itself also calls it,
    * so the next maintenance cycle self-heals.
    */
  def recover(spark: SparkSession, root: String, rels: Seq[String]): Seq[String] = {
    val rootDir = new File(root)
    rels.flatMap { rel =>
      val live = new File(rootDir, rel)
      val next = new File(rootDir, rel + "__optnext")
      val old = new File(rootDir, rel + "__optold")
      if (!live.isDirectory && next.isDirectory) {
        Files.move(next.toPath, live.toPath, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(old)
        spark.catalog.refreshByPath(live.getPath)
        Some(rel)
      } else {
        // healthy live dir: a stale __optold is a crashed cleanup — sweep
        if (live.isDirectory) deleteRecursively(old)
        None
      }
    }
  }

  /** Fold every multi-partition relation of the artifact at `root` into one
    * consolidated `batch=__opt__` partition per relation, sized at
    * ~`targetBytes` per output file ([[Compaction]]'s sizing). Relations
    * with ≤ 1 batch partition are already compact and skipped; returns one
    * [[RelOptStats]] per relation actually rewritten (empty = no-op).
    * Value-identity (search over folded ≡ search over unfolded) is pinned
    * per artifact in IndexOptimizeSpec; row counts are verified from the
    * same execution via Observation.
    *
    * DELETE ABSORB: when `tombstoneIdCol` is set and the artifact carries
    * [[Tombstones]], the fold's consolidation pass drops tombstoned rows
    * (anti-join on that column inside the same distributed read) and the
    * tombstone list is cleared once EVERY relation has been rewritten —
    * so deleted rows leave disk at the same moment their mask becomes
    * redundant. With pending tombstones even single-partition relations
    * fold (skipping one would resurrect its deleted rows the moment the
    * list cleared). A crash between the rewrites and the clear is safe:
    * the mask stays, reads stay filtered, the next fold clears it.
    */
  def optimize(
      spark: SparkSession,
      root: String,
      rels: Seq[String],
      targetBytes: Long = Compaction.DefaultTargetBytes,
      tombstoneIdCol: Option[String] = None): Seq[RelOptStats] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val rootDir = new File(root)
    recover(spark, root, rels) // self-heal a crashed prior swap first
    val tomb = tombstoneIdCol.flatMap(c =>
      Tombstones.read(spark, root).map(ts => (c, ts.localCheckpoint(true))))
    val toFold = rels
      .map(r => r -> batchDirs(new File(rootDir, r)))
      .filter { case (_, dirs) =>
        if (tomb.isDefined) dirs.nonEmpty else dirs.size > 1
      }
    if (toFold.isEmpty) {
      // nothing on disk at all: a pending tombstone list masks nothing
      if (tomb.isDefined) Tombstones.clear(spark, root)
      return Nil
    }
    // marker FIRST (see the crash-ordering argument in the object doc):
    // the ids about to lose their partitions, folded into the running set
    val ids = toFold.flatMap(_._2)
      .map(_.getName.stripPrefix("batch="))
      .filter(_ != FoldedPartition).toSet
    writeMarker(root, foldedBatches(root) ++ ids)
    val stats = toFold.map { case (rel, dirs) =>
      val relDir = new File(rootDir, rel)
      val files = dirs.flatMap(partFiles)
      val bytes = files.map(_.length()).sum
      val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val next = new File(rootDir, rel + "__optnext")
      deleteRecursively(next) // stale leftovers of a crashed prior run
      val obs = Observation()
      // one distributed pass: read the union, drop tombstoned rows (the
      // delete absorb — same pass, no extra scan), round-robin to the
      // sized file count (the Compaction rationale — even layout is the
      // point), write under the consolidated partition of a SIBLING
      // staging dir so in-flight readers of the live relation never see a
      // half layout
      val union = spark.read.parquet(relDir.getPath).drop("batch")
      val live = tomb match {
        case Some((c, ts)) =>
          require(union.columns.contains(c),
            s"tombstone id column '$c' absent from relation '$rel' — " +
              "every folded relation must carry it")
          union.join(
            org.apache.spark.sql.functions.broadcast(ts),
            union(c) === ts("id"), "left_anti")
        case None => union
      }
      live
        .observe(obs, count(lit(1)).as("rows"))
        .repartition(nOut)
        .write.mode(SaveMode.Overwrite)
        .parquet(new File(next, s"batch=$FoldedPartition").getPath)
      val old = new File(rootDir, rel + "__optold")
      deleteRecursively(old)
      Files.move(relDir.toPath, old.toPath, StandardCopyOption.ATOMIC_MOVE)
      Files.move(next.toPath, relDir.toPath, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(old)
      spark.catalog.refreshByPath(relDir.getPath)
      RelOptStats(
        rel = rel,
        inputBatches = dirs.size,
        inputFiles = files.size,
        outputFiles =
          partFiles(new File(relDir, s"batch=$FoldedPartition")).size,
        rows = obs.get("rows").asInstanceOf[Long])
    }
    // every relation rewritten without the tombstoned rows — the mask is
    // redundant now; clearing LAST keeps every crash ordering correct
    if (tomb.isDefined) Tombstones.clear(spark, root)
    stats
  }
}
