package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level DELETE state for the streamed index artifacts — the
  * `remove_ids` the absorb/OPTIMIZE loop was missing (FAISS has
  * `remove_ids`; Lucene soft-deletes + merge; this is that slot for the
  * `batch=<id>`-partitioned artifacts of [[graft.operators.VectorIndex]],
  * [[graft.operators.Retrieval]], [[graft.operators.Dedup]], and the
  * levels/bands relations of [[graft.operators.HierarchicalIndex]], whose
  * `delete` pairs the mask with an exact graph rewrite).
  *
  * A takedown list (DMCA, GDPR, opt-out — routine in corpus curation) must
  * take effect IMMEDIATELY, but the artifacts' data files are immutable
  * and rewritten only at OPTIMIZE. The standard two-phase answer:
  *
  *  - [[add]] records deleted ids under
  *    `<root>/_tombstones/batch=<id>-<contentHash>` (scoped-overwrite per
  *    (delete-batch, list) pair — idempotent under the at-least-once
  *    retry, ACCUMULATING across distinct takedowns even when they share
  *    a batch id). O(|takedown list|), no index rewrite.
  *  - Every search consults [[filterLive]]: a broadcast anti-join of the
  *    per-row relation against the tombstone set, applied BEFORE any
  *    candidate selection / stats aggregation — so results are
  *    value-identical to an index holding only surviving rows (spec-pinned
  *    per artifact). Cost: one broadcast of the (small, by the takedown
  *    contract) tombstone list into an otherwise-unchanged map-side plan.
  *  - OPTIMIZE folds the deletes PHYSICALLY ([[graft.core.IndexOptimize]]
  *    filters tombstoned rows during its consolidation pass, then [[clear]]s
  *    the list) — after the fold the deleted rows are gone from disk, not
  *    just masked.
  *
  * Tombstones are idempotent BY VALUE (deleting a deleted id is a no-op,
  * masking an already-physically-removed id filters nothing), so no fence
  * is needed against the fold: a delete batch redelivered after OPTIMIZE
  * cleared it simply re-masks rows that no longer exist.
  *
  * The underscore-prefixed directory keeps the tombstone relation invisible
  * to Spark's own file listing of the artifact root; reads address it
  * explicitly. All filesystem probes go through the Hadoop FileSystem API
  * (artifacts may live on any Hadoop filesystem).
  */
object Tombstones {

  val Dir = "_tombstones"

  private def tombPath(root: String) = new Path(s"$root/$Dir")

  private def exists(spark: SparkSession, root: String): Boolean = {
    val p = tombPath(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Record a batch of deleted ids. `ids` must expose `idCol` (cast to
    * long). UNION-PRESERVING: the write lands under a partition keyed by
    * `batchId` AND an order-independent content hash of the id list, so
    *
    *  - a RETRIED delete (same batch, same list — the at-least-once replay
    *    shape) overwrites its own partition: idempotent, no broadcast
    *    growth;
    *  - two DISTINCT takedowns that happen to share a batch id (e.g. both
    *    left on a caller's default) ACCUMULATE instead of the second
    *    silently replacing the first — replacement would resurface the
    *    first list's docs in every search and exempt them from the next
    *    physical fold, the silent-data-corruption direction.
    *
    * The hash costs one tiny aggregate over the (small, by the takedown
    * contract) id list before the write.
    */
  def add(
      spark: SparkSession,
      root: String,
      ids: DataFrame,
      idCol: String,
      batchId: String): Unit = {
    require(batchId.nonEmpty, "delete batchId must be non-empty")
    require(!batchId.contains('/') && !batchId.contains('='),
      s"delete batchId '$batchId' must be '/'- and '='-free")
    val dedup = ids.select(col(idCol).cast("long").as("id")).distinct()
    // order-independent content digest: XOR of two INDEPENDENT per-id
    // xxhash64 streams plus the count — crc32 sums are weak enough that
    // two distinct lists could collide and silently overwrite each
    // other's batch dir (the resurrection direction); a simultaneous
    // collision in both avalanche-hash xors is ~2^-128 (and xor stays
    // inside ANSI arithmetic, where a 64-bit sum would overflow loudly)
    val h = dedup
      .agg(expr("bit_xor(xxhash64(id))").as("h1"),
        expr("bit_xor(xxhash64(id, 1))").as("h2"),
        count(lit(1)).as("n")).collect()(0)
    val tag =
      if (h.isNullAt(0)) "empty"
      else java.lang.Long.toHexString(h.getLong(0)) +
        "h" + java.lang.Long.toHexString(h.getLong(1)) + "x" + h.getLong(2)
    // '=' is the tag separator: [[add]] forbids it in batchId, so
    // stripping at the LAST '=' in [[batchIds]] is exact even for ids
    // that legally contain '-' (a '-'-separated tag truncated those)
    // rebalance: tombstone lists are tiny and read by EVERY masked search
    // — one right-sized file per batch instead of one near-empty file per
    // task (guide §6 file sizing)
    dedup.hint("rebalance").write.mode("overwrite")
      .parquet(s"$root/$Dir/batch=$batchId=$tag")
    spark.catalog.refreshByPath(s"$root/$Dir")
  }

  /** The delete-batch ids currently recorded (the caller-supplied id with
    * the content-hash tag stripped) — the REDEMPTION check for artifacts
    * whose delete pairs the mask with a physical rewrite behind a fence
    * ([[graft.operators.HierarchicalIndex]]): a fold must not absorb-and-
    * clear a mask whose rewrite has not landed, or the replayed delete
    * finds nothing to replay and the dead rows outlive their mask.
    */
  def batchIds(spark: SparkSession, root: String): Seq[String] = {
    val p = tombPath(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch="))
      .map { n =>
        // current format: <id>=<tag> — '=' is forbidden in ids, so the
        // last '=' is unambiguously the separator. Legacy '-'-tagged dirs
        // (pre-change) strip at the last '-'; a raw untagged name passes
        // through.
        if (n.lastIndexOf('=') > 0) n.substring(0, n.lastIndexOf('='))
        else if (n.lastIndexOf('-') > 0) n.substring(0, n.lastIndexOf('-'))
        else n
      }
      .distinct
  }

  /** The current tombstone set as a distinct (id: Long) frame, or None if
    * no delete was ever recorded (or OPTIMIZE folded them all away).
    */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    if (!exists(spark, root)) None
    else Some(spark.read.parquet(s"$root/$Dir").select("id").distinct())

  /** `df` minus tombstoned rows — the mask every search applies to a
    * per-row relation before candidate selection or stats aggregation.
    * Broadcast anti-join (takedown lists are small by contract — a delete
    * set that rivals the corpus is a rebuild, not a takedown); a no-op
    * pass-through when no tombstones exist.
    */
  def filterLive(df: DataFrame, root: String, idCol: String): DataFrame =
    read(df.sparkSession, root) match {
      case None => df
      case Some(ts) =>
        df.join(broadcast(ts), df(idCol) === ts("id"), "left_anti")
    }

  /** Drop the tombstone relation — called by the OPTIMIZE fold AFTER every
    * per-row relation has been physically rewritten without the tombstoned
    * rows. Crash-safe by idempotence: a crash before clear leaves the
    * (now-redundant) mask in place, and the next fold re-filters nothing
    * and clears again.
    */
  def clear(spark: SparkSession, root: String): Unit = {
    val p = tombPath(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.catalog.refreshByPath(s"$root/$Dir")
    ()
  }
}
