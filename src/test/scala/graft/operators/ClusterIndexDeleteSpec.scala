package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D18: row-level takedown from the persisted cluster state. Post-delete
  * [[ClusterIndex.labels]] must equal batch CC over the SURVIVING corpus —
  * including the two hard geometries (the dead doc was the component MIN
  * → relabel; the dead doc was a CUT VERTEX → split), the crash/retry
  * matrix, and merges continuing correctly after a delete.
  */
class ClusterIndexDeleteSpec extends SparkSpec {

  import spark.implicits._

  private def truthOver(docs: org.apache.spark.sql.DataFrame) =
    Dedup.clusters(
      docs.select(col("doc_id").as("id")),
      Dedup.minHashNearDup(docs).select("a_id", "b_id"))
      .localCheckpoint(true)

  private def assertLabelsEqual(
      root: String, docs: org.apache.spark.sql.DataFrame, hint: String): Unit = {
    val got = ClusterIndex.labels(spark, root)
    val want = truthOver(docs)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"$hint: post-delete labels diverge from batch CC over survivors " +
        s"(extra=${got.exceptAll(want).take(5).toList}, " +
        s"missing=${want.exceptAll(got).take(5).toList})")
  }

  test("delete == rebuild over survivors on the real corpus") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 120).localCheckpoint(true)
    val root = tmpDir("d18_basic")
    for ((slice, b) <- Seq(col("doc_id") < 40,
        col("doc_id") >= 40 && col("doc_id") < 80,
        col("doc_id") >= 80).zipWithIndex)
      ClusterIndex.mergeBatch(s"$root/index", root, docs.filter(slice), b.toLong)
    val deadPred = col("doc_id") % 7 === 2
    ClusterIndex.delete(s"$root/index", root,
      docs.filter(deadPred).select("doc_id"), batchId = 10L)
    assertLabelsEqual(root, docs.filter(!deadPred), "corpus % 7 takedown")
  }

  // w1..w54 windows: X=w1..34, Y=w1..54, Z=w21..54 — J(X,Y)=J(Y,Z)=32/52,
  // J(X,Z)=12/52: Y is the cut vertex AND (id 1) the component min, so
  // deleting it must BOTH split the cluster and relabel both halves
  private def win(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
  private val chainDocs = Seq(
    (2L, win(1, 34)), (1L, win(1, 54)), (3L, win(21, 54)),
    (9L, "solo unrelated filler text about nothing in particular at all"))
    .toDF("doc_id", "text")

  test("deleting a cut-vertex min splits and relabels the component exactly") {
    val root = tmpDir("d18_chain")
    ClusterIndex.mergeBatch(s"$root/index", root, chainDocs, 0L)
    // the planted geometry must actually be one {1,2,3} component
    val pre = ClusterIndex.labels(spark, root)
      .filter(col("id").isin(1L, 2L, 3L)).select("cluster_id")
      .distinct().collect().map(_.getLong(0)).toList
    assert(pre == List(1L), s"fixture must cluster {1,2,3} under 1: $pre")
    ClusterIndex.delete(s"$root/index", root,
      Seq(1L).toDF("doc_id"), batchId = 1L)
    val got = ClusterIndex.labels(spark, root)
      .select("id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    assert(got == List((2L, 2L), (3L, 3L), (9L, 9L)),
      s"split+relabel diverged: $got")
    assertLabelsEqual(root, chainDocs.filter(col("doc_id") =!= 1L), "chain")
  }

  test("delete: redelivery no-ops; a lost reps commit completes from the stage") {
    // the decreasing-min chain builds a real forest: batch 1 supersedes 21
    // by 5, batch 2 supersedes both by 2 — reps rows (21->2), (5->2)
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    def batch(ids: Long*) = ids.map(i => (i, text)).toDF("doc_id", "text")
    val root = tmpDir("d18_retry")
    ClusterIndex.mergeBatch(s"$root/index", root, batch(33L, 21L), 0L)
    ClusterIndex.mergeBatch(s"$root/index", root, batch(5L), 1L)
    ClusterIndex.mergeBatch(s"$root/index", root, batch(2L), 2L)
    // snapshot the forest as of the pre-delete state
    val repsDir = new java.io.File(s"$root/reps")
    val saved = tmpDir("d18_retry_saved")
    org.apache.commons.io.FileUtils.copyDirectory(
      repsDir, new java.io.File(s"$saved/reps"))
    // delete the component min 2: survivors {5, 21, 33} stay one
    // component (exact duplicates) relabeled 5, and BOTH forest rows drop
    ClusterIndex.delete(s"$root/index", root,
      Seq(2L).toDF("doc_id"), batchId = 3L)
    assert(ClusterIndex.labels(spark, root)
      .select("id", "cluster_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
      == List((5L, 5L), (21L, 5L), (33L, 5L)), "relabel after min delete")
    val done = ClusterIndex.labels(spark, root)
      .select("id", "cluster_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    // full redelivery: both fences met -> no-op
    ClusterIndex.delete(s"$root/index", root,
      Seq(2L).toDF("doc_id"), batchId = 3L)
    assert(ClusterIndex.labels(spark, root)
      .select("id", "cluster_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
      == done, "redelivered delete mutated the state")
    // crash simulation: members committed, reps commit LOST — restore the
    // pre-delete forest and redeliver; the retry must read the staged
    // _delete relation (the dead member rows are gone) and finish the drop
    org.apache.commons.io.FileUtils.deleteDirectory(repsDir)
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$saved/reps"), repsDir)
    spark.catalog.refreshByPath(s"$root/reps")
    ClusterIndex.delete(s"$root/index", root,
      Seq(2L).toDF("doc_id"), batchId = 3L)
    assert(ClusterIndex.labels(spark, root)
      .select("id", "cluster_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
      == done, "retry after a lost reps commit did not converge")
    // anchor RETENTION: the batch-3 crash anchor must survive its own
    // delete (it is the redelivery witness — the restore above just
    // proved a late retry still needs it)...
    def anchors(): Set[String] = Option(
      new java.io.File(s"$root/_delete").listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(anchors().contains("batch=d3"),
      s"latest anchor must survive as the redelivery witness: ${anchors()}")
    // ...but a LATER completed delete fences it off for good and sweeps
    // it, keeping only its own — debris stays bounded at one anchor
    ClusterIndex.delete(s"$root/index", root,
      Seq(21L).toDF("doc_id"), batchId = 4L)
    assert(ClusterIndex.labels(spark, root)
      .select("id", "cluster_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
      == List((5L, 5L), (33L, 5L)))
    assert(!anchors().contains("batch=d3"),
      s"a fenced-off anchor was never swept: ${anchors()}")
    assert(anchors().contains("batch=d4"),
      s"the latest delete's anchor must survive: ${anchors()}")
  }

  test("property: delete == rebuild under random batch geometries and random takedowns") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val n = 100
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < n).localCheckpoint(true)
    val geom = for {
      k <- Gen.choose(3, 5)
      assign <- Gen.listOfN(n, Gen.choose(0, k)) // batch k = the LATE slice
      dead <- Gen.listOfN(n / 8, Gen.choose(0L, (n - 1).toLong))
    } yield (k, assign, dead.distinct)
    for (seed <- 1L to 3L) {
      val (k, assign, dead) = sample(geom, seed)
      val byBatch = assign.zipWithIndex.groupBy(_._1)
        .view.mapValues(_.map(_._2.toLong)).toMap
      def slice(ids: Seq[Long]) =
        if (ids.isEmpty) docs.limit(0)
        else docs.filter(col("doc_id").isin(ids.map(java.lang.Long.valueOf): _*))
      val root = tmpDir(s"d18_prop_$seed")
      for (b <- 0 until k)
        ClusterIndex.mergeBatch(s"$root/index", root,
          slice(byBatch.getOrElse(b, Nil)), b.toLong)
      // takedown mid-life (dead ids in the late slice simply no-op),
      // then one MORE merge over the rewritten state — the full lifecycle
      val lateIds = byBatch.getOrElse(k, Nil).filterNot(dead.contains)
      ClusterIndex.delete(s"$root/index", root,
        dead.toDF("doc_id"), batchId = 100L + seed)
      ClusterIndex.mergeBatch(s"$root/index", root, slice(lateIds),
        200L + seed)
      // final live set = all docs minus dead: early dead arrived then
      // deleted, late dead were pruned from the late slice (a takedown of
      // a never-ingested id is a silent no-op by design)
      assertLabelsEqual(root,
        docs.filter(!col("doc_id").isin(dead.map(java.lang.Long.valueOf): _*)),
        s"geometry seed=$seed (k=$k, |dead|=${dead.size}, |late|=${lateIds.size})")
    }
  }

  test("delete refuses a batch id already consumed by an ingest") {
    val root = tmpDir("d18_fence")
    ClusterIndex.mergeBatch(s"$root/index", root, chainDocs, 0L)
    val ex = intercept[IllegalArgumentException] {
      ClusterIndex.delete(s"$root/index", root,
        Seq(9L).toDF("doc_id"), batchId = 0L)
    }
    assert(ex.getMessage.contains("ingest"), ex.getMessage)
  }

  test("merges continue correctly after a delete (labels stay component minima)") {
    val root = tmpDir("d18_merge_after")
    ClusterIndex.mergeBatch(s"$root/index", root, chainDocs, 0L)
    ClusterIndex.delete(s"$root/index", root,
      Seq(1L).toDF("doc_id"), batchId = 1L)
    // doc 7 is a near-dup of survivor 3 (identical window): the next merge
    // must fold it into 3's (relabeled) component
    val late = Seq((7L, win(21, 54))).toDF("doc_id", "text")
    ClusterIndex.mergeBatch(s"$root/index", root, late, 2L)
    val got = ClusterIndex.labels(spark, root)
      .select("id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    assert(got == List((2L, 2L), (3L, 3L), (7L, 3L), (9L, 9L)),
      s"post-delete merge diverged: $got")
  }
}
