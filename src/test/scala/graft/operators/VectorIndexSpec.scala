package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class VectorIndexSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private val queries = Seq(0L, 1L, 2L)
  // the k13 convention: md5 first hex digit '0' plays the arriving delta
  private val deltaPred = "substring(md5(CAST(vec_id AS STRING)), 1, 1) = '0'"

  test("stored-index search is value-identical to the inline IVF-PQ query") {
    val path = tmpDir("vindex_full")
    VectorIndex.build(emb, path)
    val stored = VectorIndex.searchTopKCosine(spark, path, emb, queries, k = 10)
    val inline = Similarity.ivfPqTopKCosine(emb, queries, k = 10)
    assert(stored.exceptAll(inline).isEmpty && inline.exceptAll(stored).isEmpty,
      "search from the persisted index diverged from the inline derivation")
  }

  test("cascade served from the stored index is value-identical to the inline cascade") {
    val path = tmpDir("vindex_cascade")
    VectorIndex.build(emb, path)
    val stored = VectorIndex.cascadeSearch(spark, path, emb, queries, k = 10)
    val inline = Similarity.cascadeTopKCosine(emb, queries, k = 10)
    assert(stored.count() == 30)
    assert(stored.exceptAll(inline).isEmpty && inline.exceptAll(stored).isEmpty,
      "cascade from the persisted index diverged from the inline derivation")
    // the stored binary tier answers k9 identically too
    val storedBin = VectorIndex.binarySearch(spark, path, emb, queries, k = 10)
    val inlineBin = Similarity.binaryQuantTopKCosine(emb, queries, k = 10)
    assert(storedBin.exceptAll(inlineBin).isEmpty &&
      inlineBin.exceptAll(storedBin).isEmpty,
      "binary search from stored signatures diverged from inline")
  }

  test("IVF-only search from the stored index is value-identical to inline k3") {
    val path = tmpDir("vindex_ivfonly")
    VectorIndex.build(emb, path)
    val stored = VectorIndex.ivfSearch(spark, path, emb, queries, k = 10)
    val inline = Similarity.ivfTopKCosine(emb, queries, k = 10)
    assert(stored.count() == 30)
    assert(stored.exceptAll(inline).isEmpty && inline.exceptAll(stored).isEmpty,
      "IVF search from the persisted index diverged from the inline derivation")
  }

  test("absorb with frozen quantizers: base build + delta append == one-shot encode of the union") {
    val base = emb.filter(!expr(deltaPred))
    val delta = emb.filter(expr(deltaPred))
    assert(delta.count() > 0 && base.count() > 0, "fixture slice degenerate")

    // incremental: train on base, absorb base then delta as separate batches
    val incr = tmpDir("vindex_incr")
    VectorIndex.build(base, incr)
    VectorIndex.absorb(spark, incr, delta, "b1")

    // rebuilt: same (base-trained) quantizers, whole corpus in one batch
    val once = tmpDir("vindex_once")
    VectorIndex.train(base, once)
    VectorIndex.absorb(spark, once, emb, "all")

    for (rel <- Seq("assign", "codes", "sigs")) {
      val a = spark.read.parquet(s"$incr/$rel").drop("batch")
      val b = spark.read.parquet(s"$once/$rel").drop("batch")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$rel: incremental absorption diverged from one-shot encoding")
    }
    val sIncr = VectorIndex.searchTopKCosine(spark, incr, emb, queries, k = 10)
    val sOnce = VectorIndex.searchTopKCosine(spark, once, emb, queries, k = 10)
    assert(sIncr.exceptAll(sOnce).isEmpty && sOnce.exceptAll(sIncr).isEmpty,
      "search over appended index diverged from rebuilt index")
  }

  test("absorb is idempotent per batch id (retried batch overwrites its own partition)") {
    val delta = emb.filter(expr(deltaPred))
    val path = tmpDir("vindex_retry")
    VectorIndex.build(emb.filter(!expr(deltaPred)), path)
    VectorIndex.absorb(spark, path, delta, "b1")
    val before = spark.read.parquet(s"$path/codes").count()
    VectorIndex.absorb(spark, path, delta, "b1") // the retry
    assert(spark.read.parquet(s"$path/codes").count() == before,
      "retried absorb duplicated index rows")
  }

  test("quantizer relations are bounded artifacts (nCentroids and m*nCodes rows)") {
    val path = tmpDir("vindex_bounds")
    VectorIndex.build(emb, path, nCentroids = 32, m = 8, nCodes = 16)
    assert(spark.read.parquet(s"$path/centroids").count() <= 32)
    assert(spark.read.parquet(s"$path/codebook").count() == 8L * 16)
  }

  test("absorb/search with mismatched hyperparameters fail loudly, not silently wrong") {
    val path = tmpDir("vindex_meta")
    VectorIndex.build(emb, path, m = 16)
    // m=8 against an m=16 index: the codebook HAS subspaces 0..7, so
    // without the meta guard the encode would silently mis-slice
    val e1 = intercept[IllegalArgumentException] {
      VectorIndex.absorb(spark, path, emb.filter(expr(deltaPred)), "b1", m = 8)
    }
    assert(e1.getMessage.contains("m=16"))
    val e2 = intercept[IllegalArgumentException] {
      VectorIndex.searchTopKCosine(spark, path, emb, queries, k = 10, m = 8)
    }
    assert(e2.getMessage.contains("m=16"))
  }
}
