package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style pins for the ST19 incremental cluster state: under
  * ARBITRARY batch geometries (random partition counts, random doc-to-batch
  * assignment, interleaved arrival — the orderings a real ingest produces),
  * the maintained labels must equal batch CC over the full pair set, and a
  * redelivered mid-stream batch must be absorbed exactly once. Raw
  * ScalaCheck generators with fixed seeds (the CurationPropertySpec
  * convention — deterministic, no scalatestplus bridge offline).
  */
class ClusterIndexPropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // a batch-count + a batch assignment for each of the first `n` docs
  // (k from 3 so every sampled geometry can host a ≥3-stage merge chain —
  // the regime where the round-12 reps carry-forward bug lived)
  private def geometryGen(n: Int): Gen[(Int, List[Int])] = for {
    k <- Gen.choose(3, 6)
    assign <- Gen.listOfN(n, Gen.choose(0, k - 1))
  } yield (k, assign)

  test("property: streamed cluster state equals batch CC under random batch geometries") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 120) // enough near-dup structure, fast loop
      .localCheckpoint(true)
    val truth = Dedup.clusters(
      docs.select(col("doc_id").as("id")),
      Dedup.minHashNearDup(docs).select("a_id", "b_id"))
      .localCheckpoint(true)
    val n = 120
    for (seed <- 1L to 3L) {
      val (k, assign) = sample(geometryGen(n), seed)
      val byBatch = assign.zipWithIndex.groupBy(_._1)
        .view.mapValues(_.map(_._2.toLong)).toMap
      val root = tmpDir(s"st19_prop_$seed")
      for (b <- 0 until k) {
        val ids = byBatch.getOrElse(b, Nil)
        val batch =
          if (ids.isEmpty) docs.limit(0)
          else docs.filter(col("doc_id").isin(ids.map(java.lang.Long.valueOf): _*))
        ClusterIndex.mergeBatch(s"$root/index", root, batch, b.toLong)
      }
      val got = ClusterIndex.labels(spark, root)
      assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
        s"geometry seed=$seed (k=$k): streamed labels diverge from batch CC")
    }
  }

  test("regression: a reps bucket emptied by compression migration drops its stale lines") {
    // The round-12 judge repro: exact-duplicate texts arriving with
    // DECREASING minima across 3 batches. Batch 1 superseded label 21 by 5
    // (reps row (21 -> 5) in bucket pmod(5)); batch 2 remaps 5 -> 2, and
    // compression rewrites (21 -> 2), (5 -> 2) into bucket pmod(2) — bucket
    // pmod(5) is now EMPTY. Before the touched-declaration fix, commit
    // derived touched partitions from written data only, carried bucket
    // pmod(5)'s stale (21 -> 5) line forward, and labels() emitted ids 33
    // and 21 twice (clusters 2 AND 5).
    import spark.implicits._
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    def batch(ids: Long*) =
      ids.map(i => (i, text)).toDF("doc_id", "text")
    val root = tmpDir("st19_regress")
    ClusterIndex.mergeBatch(s"$root/index", root, batch(33L, 21L), 0L)
    ClusterIndex.mergeBatch(s"$root/index", root, batch(5L), 1L)
    ClusterIndex.mergeBatch(s"$root/index", root, batch(2L), 2L)
    val got = ClusterIndex.labels(spark, root)
      .select("id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    assert(got === List((2L, 2L), (5L, 2L), (21L, 2L), (33L, 2L)),
      s"stale reps row survived bucket migration: $got")
  }

  test("property: multi-stage decreasing-min merge chains under k in [3,6]") {
    // Forced ≥3-stage chain geometries the random-assignment property can
    // miss: one planted duplicate cluster whose arriving ids DECREASE
    // across batches (every batch supersedes the previous minimum, so
    // every batch migrates the whole compressed chain to a new bucket),
    // interleaved with singleton non-dup docs so members stays multi-
    // bucket. Checked against batch CC over the full pair set.
    import spark.implicits._
    val dupText = (1 to 40).map(i => s"dup$i").mkString(" ")
    for (k <- 3 to 6) {
      val root = tmpDir(s"st19_chain_$k")
      // batch b carries duplicate id (100 - 10*b) — strictly decreasing —
      // plus a unique singleton (1000 + b) with its own text
      val allIds = scala.collection.mutable.ListBuffer[Long]()
      for (b <- 0 until k) {
        val dupId = (100 - 10 * b).toLong
        val single = (1000 + b).toLong
        allIds += dupId += single
        val rows = Seq(
          (dupId, dupText),
          (single, (1 to 40).map(i => s"uniq${b}_$i").mkString(" ")))
        ClusterIndex.mergeBatch(
          s"$root/index", root, rows.toDF("doc_id", "text"), b.toLong)
      }
      val minDup = (100 - 10 * (k - 1)).toLong
      val got = ClusterIndex.labels(spark, root)
        .select("id", "cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
      val want = allIds.toList.map { id =>
        if (id < 1000L) (id, minDup) else (id, id)
      }.sorted
      assert(got === want,
        s"k=$k decreasing-min chain: got $got, want $want")
    }
  }

  test("property: a redelivered MID-stream batch leaves the final state unchanged") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 90).localCheckpoint(true)
    val truth = Dedup.clusters(
      docs.select(col("doc_id").as("id")),
      Dedup.minHashNearDup(docs).select("a_id", "b_id"))
      .localCheckpoint(true)
    val slices = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val root = tmpDir("st19_redeliver")
    ClusterIndex.mergeBatch(s"$root/index", root, slices(0), 0L)
    ClusterIndex.mergeBatch(s"$root/index", root, slices(1), 1L)
    // the crash-retry: batch 1 re-delivered after batch 1 committed (the
    // at-least-once case the manifest fence exists for)
    ClusterIndex.mergeBatch(s"$root/index", root, slices(1), 1L)
    ClusterIndex.mergeBatch(s"$root/index", root, slices(2), 2L)
    val got = ClusterIndex.labels(spark, root)
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty,
      "redelivered batch corrupted the cluster state")
  }
}
