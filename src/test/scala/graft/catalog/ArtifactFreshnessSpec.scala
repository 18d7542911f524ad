package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** U12: the freshness monitor must count each artifact exactly as its
  * searches consume it — absorbs raise the count, a tombstoned takedown
  * lowers it IMMEDIATELY (masked-but-unfolded reads as "not indexed",
  * matching what the search surfaces), and the physical fold keeps it.
  */
class ArtifactFreshnessSpec extends SparkSpec {

  import spark.implicits._

  private val docs = graft.core.Tables.load(spark, sf, "documents")
    .filter(col("doc_id") < 100).localCheckpoint(true)

  test("text index: counts track absorb, masked takedown, and the physical fold") {
    val path = tmpDir("graft_fresh_tidx")
    val n0 = docs.filter(col("doc_id") < 60).count()
    val nAll = docs.count()
    graft.operators.Retrieval.absorbTextIndex(
      path, docs.filter(col("doc_id") < 60), "b0")
    assert(ArtifactFreshness.textIndexedDocs(spark, path) == n0,
      "first absorb not reflected")
    graft.operators.Retrieval.absorbTextIndex(
      path, docs.filter(col("doc_id") >= 60), "b1")
    assert(ArtifactFreshness.textIndexedDocs(spark, path) == nAll,
      "second absorb not reflected")
    // the takedown lowers the count BEFORE any fold — the monitor reads
    // what the search reads, not what is physically on disk
    val dead = docs.filter(col("doc_id") % 10 === 0).select("doc_id")
    val nLive = nAll - dead.count()
    graft.operators.Retrieval.deleteFromTextIndex(spark, path, dead)
    assert(ArtifactFreshness.textIndexedDocs(spark, path) == nLive,
      "masked takedown must read as not-indexed immediately")
    // and the physical fold leaves the count unchanged (mask absorbed)
    graft.operators.Retrieval.optimizeTextIndex(spark, path)
    assert(graft.core.Tombstones.read(spark, path).isEmpty)
    assert(ArtifactFreshness.textIndexedDocs(spark, path) == nLive,
      "physical fold changed the indexed count")
  }

  test("vector index and minhash index: structural one-row-per-item counts") {
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") < 120).localCheckpoint(true)
    val vPath = tmpDir("graft_fresh_vidx")
    graft.operators.VectorIndex.build(emb, vPath)
    assert(ArtifactFreshness.vectorIndexedRows(spark, vPath) == emb.count())
    val mPath = tmpDir("graft_fresh_midx")
    graft.operators.Dedup.writeIndex(docs, mPath)
    assert(ArtifactFreshness.minhashIndexedDocs(spark, mPath) == docs.count())
    // a takedown masks the minhash count immediately too
    graft.operators.Dedup.deleteFromIndex(spark, mPath,
      docs.filter(col("doc_id") < 5).select("doc_id"), "doc_id")
    assert(ArtifactFreshness.minhashIndexedDocs(spark, mPath) ==
      docs.count() - 5)
  }

  test("cluster members: manifest-committed state counts survivors after delete") {
    val root = tmpDir("graft_fresh_cl")
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val batch = (1L to 12L).map(i => (i, text + s" u$i")).toDF("doc_id", "text")
    graft.operators.ClusterIndex.mergeBatch(s"$root/index", root, batch, 0L)
    assert(ArtifactFreshness.clusterMembers(spark, root) == 12L)
    graft.operators.ClusterIndex.delete(s"$root/index", root,
      Seq(3L, 7L).toDF("doc_id"), batchId = 1L)
    assert(ArtifactFreshness.clusterMembers(spark, root) == 10L,
      "deleted members still counted")
  }
}
