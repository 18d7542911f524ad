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
  *  - [[add]] records deleted ids under `<root>/_tombstones/batch=<id>`
  *    (scoped-overwrite per delete-batch id — the same idempotent-retry
  *    shape as the absorbs). O(|takedown list|), no index rewrite.
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
    * long); `batchId` scopes the overwrite so a retried delete replaces
    * its own partition instead of duplicating rows (duplicates would be
    * harmless for the anti-join but would grow the broadcast).
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
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .write.mode("overwrite").parquet(s"$root/$Dir/batch=$batchId")
    spark.catalog.refreshByPath(s"$root/$Dir")
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
