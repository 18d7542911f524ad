package graft.streaming

import graft.SparkSpec
import graft.core.ManifestTable
import org.apache.spark.sql.functions._

/** ROW-LEVEL CDF IMAGES (round 19 — SURVEY §9 #3): the file-level feed's
  * delete × insert sides of a KEYED version pair into update_preimage/
  * update_postimage; carried rows vanish; unkeyed versions pass through.
  */
class RowImagesSpec extends SparkSpec {

  import spark.implicits._

  test("a merge version's feed shows updates as pre/post pairs; carried rows drop; inserts stay inserts") {
    val root = tmpDir("graft_rowimg") + "/t"
    ManifestTable.commit(spark, root,
      Seq((1L, 10L, "p0"), (2L, 20L, "p0"), (3L, 30L, "p1"))
        .toDF("k", "n", "part"),
      "part", batchId = 0L)
    // update k=1 (touches p0 — k=2 is CARRIED through the rewrite),
    // insert k=9 into p1
    ManifestTable.merge(spark, root,
      Seq((1L, 11L, "p0"), (9L, 90L, "p1")).toDF("k", "n", "part"),
      "k", batchId = 1L)
    val img = ChangeFeed.rowImages(spark, root, startingVersion = 1L)
      .select("k", "n", "part", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(img == Set(
      (1L, 10L, "p0", "update_preimage", 1L),
      (1L, 11L, "p0", "update_postimage", 1L),
      (9L, 90L, "p1", "insert", 1L)), img.toString)
    // the recorded key rides the history
    assert(ManifestTable.history(spark, root).head.opKey == Seq("k"))
  }

  test("a deleteRows version yields plain deletes (no insert side to pair); an unkeyed append passes through") {
    val root = tmpDir("graft_rowimg_del") + "/t"
    ManifestTable.commit(spark, root,
      Seq((1L, 10L, "p0"), (2L, 20L, "p0")).toDF("k", "n", "part"),
      "part", batchId = 0L)
    assert(ManifestTable.deleteRows(
      spark, root, Seq(1L).toDF("k"), "k").nonEmpty)
    Seq((5L, 50L, "p5")).toDF("k", "n", "part")
      .write.format("graft-manifest").mode("append")
      .option("batchId", "1").save(root)
    val img = ChangeFeed.rowImages(spark, root, startingVersion = 1L)
      .select("k", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(img == Set(
      (1L, "delete", 1L), // the deleted row; k=2 carried and dropped
      (5L, "insert", 2L)), img.toString)
  }

  test("the rowImages FORMAT OPTION serves the pairing (round 20): pre/post pairs, carried drop, unkeyed passthrough, dup-key fallback — and streaming refuses") {
    val root = tmpDir("graft_rowimg_opt") + "/t"
    ManifestTable.commit(spark, root,
      Seq((1L, 10L, "p0"), (1L, 15L, "p0"), (2L, 20L, "p0"),
        (3L, 30L, "p1")).toDF("k", "n", "part"),
      "part", batchId = 0L)
    // v1 KEYED: k=3 updates (pairs), k=1 is a dup key (fallback), k=2
    // carries (drops); v2 UNKEYED append (passthrough)
    ManifestTable.merge(spark, root,
      Seq((3L, 31L, "p1")).toDF("k", "n", "part"), "k", batchId = 1L)
    ManifestTable.merge(spark, root,
      Seq((1L, 99L, "p0")).toDF("k", "n", "part"), "k", batchId = 2L)
    Seq((5L, 50L, "p5")).toDF("k", "n", "part")
      .write.format("graft-manifest").mode("append")
      .option("batchId", "3").save(root)
    val img = spark.read.format("graft-manifest")
      .option("readChangeFeed", "true")
      .option("rowImages", "true")
      .option("startingVersion", "1")
      .load(root)
      .select("k", "n", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq.sorted
    assert(img == Seq(
      (1L, 10L, "delete", 2L), (1L, 15L, "delete", 2L),
      (1L, 99L, "insert", 2L),
      (3L, 30L, "update_preimage", 1L),
      (3L, 31L, "update_postimage", 1L),
      (5L, 50L, "insert", 3L)), img.toString)
    // streaming + rowImages refuses loudly (pairing needs a version's
    // both sides — a batch-window property)
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").option("rowImages", "true")
      .load(root)
      .writeStream.format("noop")
      .option("checkpointLocation", tmpDir("graft_rowimg_ckpt"))
      .start()
    val e = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("rowImages")), msgs(e).toString)
  }

  test("duplicate keys within a version fall back to delete+insert (no row identity to pair on)") {
    val root = tmpDir("graft_rowimg_dup") + "/t"
    // TWO rows share k=1 in the seed; the merge's single update row for
    // k=1 replaces both — 2 deletes x 1 insert cannot pair
    ManifestTable.commit(spark, root,
      Seq((1L, 10L, "p0"), (1L, 15L, "p0"), (2L, 20L, "p0"))
        .toDF("k", "n", "part"),
      "part", batchId = 0L)
    ManifestTable.merge(spark, root,
      Seq((1L, 99L, "p0")).toDF("k", "n", "part"), "k", batchId = 1L)
    // EXACT MULTISET, not a set (ADVICE r19: the full-outer pairing
    // fanned each fallback side out once per opposite-side row — 2
    // deletes x 1 insert emitted the insert twice — and a set compare
    // masked it; a consumer applying the feed would double-apply)
    val img = ChangeFeed.rowImages(spark, root, startingVersion = 1L)
      .select("k", "n", "_change_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sorted
    assert(img == Seq(
      (1L, 10L, "delete"), (1L, 15L, "delete"), (1L, 99L, "insert")),
      img.toString)
  }
}
