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
  private def geometryGen(n: Int): Gen[(Int, List[Int])] = for {
    k <- Gen.choose(2, 4)
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
