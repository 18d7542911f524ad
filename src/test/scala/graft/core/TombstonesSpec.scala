package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TombstonesSpec extends SparkSpec {

  import spark.implicits._

  test("add/read/filterLive/clear round-trip; idempotent by value") {
    val root = tmpDir("graft_tomb")
    assert(Tombstones.read(spark, root).isEmpty)
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "x")
    // no tombstones: pass-through
    assert(Tombstones.filterLive(df, root, "doc_id").count() == 3L)
    Tombstones.add(spark, root, Seq(2L).toDF("doc_id"), "doc_id", "t0")
    val ts = Tombstones.read(spark, root)
    assert(ts.isDefined && ts.get.collect().map(_.getLong(0)).toSet == Set(2L),
      s"tombstone read lost the delete: ${ts.map(_.collect().toList)}")
    assert(Tombstones.filterLive(df, root, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // retried delete batch replaces its own partition (no growth)
    Tombstones.add(spark, root, Seq(2L).toDF("doc_id"), "doc_id", "t0")
    assert(Tombstones.read(spark, root).get.count() == 1L)
    // second batch accumulates
    Tombstones.add(spark, root, Seq(3L).toDF("doc_id"), "doc_id", "t1")
    assert(Tombstones.filterLive(df, root, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
    // two DISTINCT takedowns sharing one batch id (e.g. a caller default)
    // must ALSO accumulate — a silent replace would resurface the first
    // list's docs in every search and exempt them from the next fold
    val root2 = tmpDir("graft_tomb_dflt")
    Tombstones.add(spark, root2, Seq(1L).toDF("doc_id"), "doc_id", "takedown")
    Tombstones.add(spark, root2, Seq(2L).toDF("doc_id"), "doc_id", "takedown")
    assert(Tombstones.read(spark, root2).get
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "a repeated default batch id replaced the first takedown list")
    // ...while the same list under the same id stays one partition
    Tombstones.add(spark, root2, Seq(2L).toDF("doc_id"), "doc_id", "takedown")
    assert(Tombstones.read(spark, root2).get.count() == 2L)
    Tombstones.clear(spark, root)
    assert(Tombstones.read(spark, root).isEmpty)
    assert(Tombstones.filterLive(df, root, "doc_id").count() == 3L)
  }

  test("batchIds round-trips ids that contain '-' (the '=' tag separator cannot occur in an id)") {
    // the round-14 ADVICE low finding: stripping the content-hash tag at
    // the LAST '-' truncated legal ids like '2024-01-01' to '2024-01',
    // corrupting the redemption-fence ids HierarchicalIndex.optimize
    // consumes. The separator is now '=' — forbidden in ids by add().
    val root = tmpDir("graft_tomb_ids")
    Tombstones.add(spark, root, Seq(1L).toDF("doc_id"), "doc_id",
      "2024-01-01")
    Tombstones.add(spark, root, Seq(2L).toDF("doc_id"), "doc_id", "d7")
    assert(Tombstones.batchIds(spark, root).toSet == Set("2024-01-01", "d7"),
      s"got ${Tombstones.batchIds(spark, root)}")
    // a retry of the '-'-bearing id still overwrites its own partition
    Tombstones.add(spark, root, Seq(1L).toDF("doc_id"), "doc_id",
      "2024-01-01")
    assert(Tombstones.read(spark, root).get.count() == 2L)
    intercept[IllegalArgumentException] {
      Tombstones.add(spark, root, Seq(3L).toDF("doc_id"), "doc_id", "a=b")
    }
  }

  test("text index: tombstoned search equals index rebuilt from surviving corpus; OPTIMIZE folds physically") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 200).localCheckpoint(true)
    val takedown = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
      .localCheckpoint(true)
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      .localCheckpoint(true)
    val masked = tmpDir("graft_tomb_tidx_m")
    // two absorb batches so the delete fold exercises the multi-partition path
    graft.operators.Retrieval.absorbTextIndex(
      masked, docs.filter(col("doc_id") % 2 === 0), "b0")
    graft.operators.Retrieval.absorbTextIndex(
      masked, docs.filter(col("doc_id") % 2 === 1), "b1")
    graft.operators.Retrieval.deleteFromTextIndex(
      spark, masked, takedown)
    val rebuilt = tmpDir("graft_tomb_tidx_r")
    graft.operators.Retrieval.buildTextIndex(
      docs.join(takedown, Seq("doc_id"), "left_anti"), rebuilt)
    val got = graft.operators.Retrieval
      .searchTextIndex(spark, masked, queries).localCheckpoint(true)
    val want = graft.operators.Retrieval
      .searchTextIndex(spark, rebuilt, queries).localCheckpoint(true)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "tombstone-masked BM25 diverges from the rebuilt-from-survivors index")
    // a tombstoned doc must never appear even though its rows are on disk
    assert(got.join(takedown, got("doc_id") === takedown("doc_id")).isEmpty)
    // OPTIMIZE = the delete absorb: rows leave disk, the mask clears,
    // search is unchanged
    val stats = graft.operators.Retrieval.optimizeTextIndex(spark, masked)
    assert(stats.nonEmpty, "fold skipped despite pending tombstones")
    assert(Tombstones.read(spark, masked).isEmpty,
      "tombstones survived the fold")
    val postFoldRows = spark.read.parquet(s"$masked/postings")
      .join(takedown, Seq("doc_id"), "left_semi").count()
    assert(postFoldRows == 0L,
      s"$postFoldRows tombstoned postings rows survived the physical fold")
    val after = graft.operators.Retrieval
      .searchTextIndex(spark, masked, queries)
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty,
      "search changed across the delete fold")
  }

  test("vector index: tombstoned searches equal an index absorbed from survivors only") {
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") < 150).localCheckpoint(true)
    val takedown = emb.filter(col("vec_id") % 11 === 5).select("vec_id")
      .localCheckpoint(true)
    val qids = Seq(0L, 1L, 2L)
    val masked = tmpDir("graft_tomb_vidx_m")
    graft.operators.VectorIndex.build(emb, masked)
    graft.operators.VectorIndex.delete(spark, masked, takedown)
    // survivors-only twin under the SAME frozen quantizers (the FAISS
    // remove_ids contract: remove from the lists, quantizer untouched)
    val twin = tmpDir("graft_tomb_vidx_r")
    graft.operators.VectorIndex.train(emb, twin)
    graft.operators.VectorIndex.absorb(
      spark, twin, emb.join(takedown, Seq("vec_id"), "left_anti"), "base")
    def check(name: String,
        run: String => org.apache.spark.sql.DataFrame): Unit = {
      val got = run(masked).localCheckpoint(true)
      val want = run(twin).localCheckpoint(true)
      assert(got.count() > 0, s"$name returned nothing")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"$name: tombstone-masked search diverges from the survivors-only index")
    }
    check("ivfpq", p => graft.operators.VectorIndex
      .searchTopKCosine(spark, p, emb, qids, k = 10))
    check("ivf", p => graft.operators.VectorIndex
      .ivfSearch(spark, p, emb, qids, k = 10))
    check("binary", p => graft.operators.VectorIndex
      .binarySearch(spark, p, emb, qids, k = 10))
    check("cascade", p => graft.operators.VectorIndex
      .cascadeSearch(spark, p, emb, qids, k = 10))
    // physical fold, then identical again from disk alone
    assert(graft.operators.VectorIndex.optimize(spark, masked).nonEmpty)
    assert(Tombstones.read(spark, masked).isEmpty)
    val assignPost = spark.read.parquet(s"$masked/assign")
    assert(assignPost.join(takedown,
      assignPost("id") === takedown("vec_id"), "left_semi").count() == 0L,
      "tombstoned vectors survived the physical fold")
    check("ivfpq-postfold", p => graft.operators.VectorIndex
      .searchTopKCosine(spark, p, emb, qids, k = 10))
  }

  test("dedup index: a taken-down doc stops surfacing as a pair endpoint") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 150).localCheckpoint(true)
    val index = tmpDir("graft_tomb_didx")
    graft.operators.Dedup.writeIndex(docs, index)
    // pick a doc that DOES pair with something in the baseline run
    val delta = docs.filter(col("doc_id") >= 100)
    val base = graft.operators.Dedup.incrementalFromIndex(
      spark, index, delta).localCheckpoint(true)
    val someEndpoint = base.select(col("a_id")).limit(1)
      .collect().headOption.map(_.getLong(0))
    assume(someEndpoint.isDefined, "fixture produced no pairs")
    val victim = someEndpoint.get
    graft.operators.Dedup.deleteFromIndex(
      spark, index, Seq(victim).toDF("doc_id"))
    val after = graft.operators.Dedup.incrementalFromIndex(
      spark, index, delta.filter(col("doc_id") =!= victim))
    assert(after.filter(col("a_id") === victim || col("b_id") === victim)
      .isEmpty, s"deleted doc $victim still surfaces as a pair endpoint")
  }
}
