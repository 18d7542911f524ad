package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** U12: the FRESHNESS monitor for the persisted index artifacts — the
  * operational read every deployed index family needs next to its quality
  * monitor (K16 grades recall; this grades COVERAGE): how many corpus rows
  * does each stored artifact actually index right now? An ingest loop that
  * silently dropped a batch, an absorb that crashed before its fence, or a
  * takedown that physically landed all surface here as an indexed-row
  * count that drifts from the corpus — the drift IS the staleness signal
  * that triggers a catch-up absorb or a rebuild.
  *
  * Each reader counts the artifact's PER-ROW relation exactly as its
  * searches consume it — tombstone-masked ([[graft.core.Tombstones]]), so
  * a masked-but-not-yet-folded takedown already reads as "not indexed",
  * matching what the search surfaces. Costs: one column-pruned distinct
  * count per artifact, nothing driver-side beyond the final scalar.
  *
  * Reference scope: no counterpart in `backend/main.py` (the reference has
  * no index artifacts); extension family U (SURVEY §2.5).
  */
object ArtifactFreshness {

  /** Distinct docs in a stored MinHash dedup index ([[graft.operators
    * .Dedup.writeIndex]] layout: `sets/batch=*`), mask applied.
    */
  def minhashIndexedDocs(spark: SparkSession, index: String): Long =
    graft.core.Tombstones.filterLive(
      spark.read.parquet(s"$index/sets").select("id"), index, "id")
      .distinct().count()

  /** Distinct docs in a stored BM25 postings index ([[graft.operators
    * .Retrieval.buildTextIndex]] layout: `postings/batch=*`), mask applied.
    */
  def textIndexedDocs(spark: SparkSession, index: String): Long =
    graft.core.Tombstones.filterLive(
      spark.read.parquet(s"$index/postings").select("doc_id"),
      index, "doc_id")
      .distinct().count()

  /** Vectors in a stored IVF-PQ index ([[graft.operators.VectorIndex]]
    * layout: `assign/batch=*` — one row per indexed vector), mask applied.
    */
  def vectorIndexedRows(spark: SparkSession, index: String): Long =
    graft.core.Tombstones.filterLive(
      spark.read.parquet(s"$index/assign").select("id"), index, "id")
      .distinct().count()

  /** Nodes in a stored hierarchical pyramid ([[graft.operators
    * .HierarchicalIndex]] layout: `levels/batch=*`), mask applied — a
    * deleted-but-not-yet-purged node already counts as gone, exactly as
    * the layered search treats it.
    */
  def hierIndexedNodes(spark: SparkSession, index: String): Long =
    graft.core.Tombstones.filterLive(
      spark.read.parquet(s"$index/levels").select("id"), index, "id")
      .distinct().count()

  /** Members in a persisted cluster state ([[graft.operators
    * .ClusterIndex]] `members` manifest — deletes rewrite physically, so
    * no mask applies).
    */
  def clusterMembers(spark: SparkSession, root: String): Long =
    graft.core.ManifestTable.read(spark, s"$root/members")
      .map(_.select("id").count()).getOrElse(0L)
}
