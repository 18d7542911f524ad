package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ST21: the CDF-maintained consumer state must equal a batch recompute
  * over the producer's CURRENT snapshot at every catch-up point — across
  * appends, a takedown, a schema-evolution boundary and a pure-OPTIMIZE
  * version — and the offset-in-the-fence design must make any re-run a
  * no-op.
  */
class ChangeFeedSpec extends SparkSpec {

  import spark.implicits._

  private def recompute(prod: String): Set[(String, Long, Long)] =
    graft.core.ManifestTable.read(spark, prod).get
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(
          (if (graft.core.ManifestTable.read(spark, prod).get.columns
            .contains("n_chars")) col("n_chars").cast("long")
          else lit(null).cast("long")), lit(0L))).as("chars_total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def stateRows(st: String): Set[(String, Long, Long)] =
    ChangeFeed.state(spark, st)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("consumer state tracks the producer through append, delete, evolution and optimize") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 200).localCheckpoint(true)
    val root = tmpDir("graft_cdf_consumer")
    val (prod, st) = (root + "/t", root + "/state")
    // v0/v1: two pre-evolution appends
    graft.core.ManifestTable.commit(spark, prod,
      docs.filter(col("doc_id") % 4 === 0).select("doc_id", "lang")
        .withColumn("part", lit("b0")), "part", 0L)
    assert(ChangeFeed.catchUp(spark, prod, st) == 0L)
    assert(stateRows(st) == recompute(prod), "initial load diverged")
    graft.core.ManifestTable.commit(spark, prod,
      docs.filter(col("doc_id") % 4 === 1).select("doc_id", "lang")
        .withColumn("part", lit("b1")), "part", 1L)
    // v2: a takedown nets NEGATIVE counts
    graft.core.ManifestTable.deleteRows(spark, prod,
      docs.filter(col("doc_id") % 20 === 8).select("doc_id"), "doc_id")
    assert(ChangeFeed.catchUp(spark, prod, st) == 2L)
    assert(stateRows(st) == recompute(prod), "delete catch-up diverged")
    // v3: the schema-evolution boundary — n_chars arrives
    graft.core.ManifestTable.commit(spark, prod,
      docs.filter(col("doc_id") % 4 === 2)
        .select("doc_id", "lang", "n_chars")
        .withColumn("part", lit("b2")), "part", 2L)
    assert(ChangeFeed.catchUp(spark, prod, st) == 3L)
    assert(stateRows(st) == recompute(prod), "evolution catch-up diverged")
    // a pure-OPTIMIZE version must advance the offset with zero change
    val before = stateRows(st)
    graft.core.ManifestTable.optimize(spark, prod)
    val vOpt = graft.core.ManifestTable.currentVersion(spark, prod)
    assert(ChangeFeed.catchUp(spark, prod, st) == vOpt)
    assert(stateRows(st) == before, "an OPTIMIZE version changed the state")
    assert(graft.core.ManifestTable.lastBatch(spark, st) == vOpt,
      "offset did not advance past the OPTIMIZE version")
    // crash/re-run idempotence: the offset rides the state table's fence
    assert(ChangeFeed.catchUp(spark, prod, st) == vOpt)
    assert(stateRows(st) == before, "a re-run catch-up mutated the state")
    // chars really flow: evolved rows contributed positive totals
    assert(before.exists(_._3 > 0L), "evolution rows contributed no chars")
    // and pre-evolution rows contributed zero (null-filled under the
    // evolved schema): per-lang chars equal the sum over %4==2 rows only
    val expChars = docs.filter(col("doc_id") % 4 === 2)
      .filter(!(col("doc_id") % 20 === 8))
      .groupBy("lang").agg(sum(col("n_chars").cast("long")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    before.foreach { case (lang, _, chars) =>
      assert(chars == expChars.getOrElse(lang, 0L),
        s"chars for $lang: got $chars want ${expChars.getOrElse(lang, 0L)}")
    }
  }

  test("a consumer whose initial load runs under a pending deferred mask stays exact through the purge — one masking convention end to end") {
    // the round-14 ADVICE medium finding: readVersion masks but changes()
    // reads raw, so a masked initial load would drop the masked rows once
    // and the purge version's raw removed side would subtract them again
    // (negative counts). The CDC diff base now reads RAW — the deletion
    // enters the feed exactly once, at the purge version.
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 120).select("doc_id", "lang", "n_chars")
      .localCheckpoint(true)
    val root = tmpDir("graft_cdf_dv")
    val (prod, st, rep) = (root + "/t", root + "/state", root + "/r")
    graft.core.ManifestTable.commit(spark, prod,
      docs.withColumn("part", lit("b0")), "part", 0L)
    // the takedown is DEFERRED: a mask, not a version
    graft.core.ManifestTable.deleteRowsDeferred(spark, prod,
      docs.filter(col("doc_id") % 9 === 2).select("doc_id"), "doc_id")
    // consumer + replica bootstrap WHILE the mask is pending
    assert(ChangeFeed.catchUp(spark, prod, st) == 0L)
    assert(ChangeFeed.replicate(spark, prod, rep, "doc_id", "part") == 0L)
    // the purge publishes the deletion's version; both consumers follow
    graft.core.ManifestTable.optimize(spark, prod)
    ChangeFeed.catchUp(spark, prod, st)
    ChangeFeed.replicate(spark, prod, rep, "doc_id", "part")
    assert(stateRows(st) == recompute(prod),
      "state diverged across a mask-pending bootstrap + purge")
    assert(stateRows(st).forall(r => r._2 > 0L && r._3 >= 0L),
      "double-subtracted masked rows drove a count negative")
    val p = graft.core.ManifestTable.read(spark, prod).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r = ChangeFeed.replica(spark, rep)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r == p, "replica diverged across a mask-pending bootstrap + purge")
  }

  test("coalesced catch-up equals the per-version path with fewer state commits; schema boundaries split runs") {
    // r14 verdict #4: a consumer that fell N versions behind should pay
    // one net delta + one commit per SAME-SCHEMA run, not per version.
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 160).localCheckpoint(true)
    val root = tmpDir("graft_cdf_coal")
    val prod = root + "/t"
    // v0..v2: three pre-evolution appends (one schema run)
    for (b <- 0 until 3)
      graft.core.ManifestTable.commit(spark, prod,
        docs.filter(col("doc_id") % 4 === b).select("doc_id", "lang")
          .withColumn("part", lit(s"b$b")), "part", b.toLong)
    // v3: the schema boundary (n_chars arrives); v4: a takedown (same
    // schema as v3 — deletes carry the recorded schema forward)
    graft.core.ManifestTable.commit(spark, prod,
      docs.filter(col("doc_id") % 4 === 3)
        .select("doc_id", "lang", "n_chars")
        .withColumn("part", lit("b3")), "part", 3L)
    graft.core.ManifestTable.deleteRows(spark, prod,
      docs.filter(col("doc_id") % 10 === 6).select("doc_id"), "doc_id")
    assert(graft.core.ManifestTable.currentVersion(spark, prod) == 4L)
    // twin consumers: coalesced vs per-version
    val (stA, stB) = (root + "/stateA", root + "/stateB")
    assert(ChangeFeed.catchUp(spark, prod, stA) == 4L)
    assert(ChangeFeed.catchUp(spark, prod, stB, coalesce = false) == 4L)
    assert(stateRows(stA) == stateRows(stB),
      "coalesced catch-up diverged from the per-version path")
    assert(stateRows(stA) == recompute(prod))
    // step count: two runs ([v0..v2] then [v3..v4]) vs five versions
    assert(graft.core.ManifestTable.currentVersion(spark, stA) == 1L,
      "expected exactly 2 coalesced state commits")
    assert(graft.core.ManifestTable.currentVersion(spark, stB) == 4L)
    assert(graft.core.ManifestTable.lastBatch(spark, stA) == 4L)
    // twin replicas
    val (repA, repB) = (root + "/repA", root + "/repB")
    assert(ChangeFeed.replicate(spark, prod, repA, "doc_id", "part") == 4L)
    assert(ChangeFeed.replicate(
      spark, prod, repB, "doc_id", "part", coalesce = false) == 4L)
    val a = ChangeFeed.replica(spark, repA)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = ChangeFeed.replica(spark, repB)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val p = graft.core.ManifestTable.read(spark, prod).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == p && b == p,
      "a replica diverged from the producer snapshot")
    assert(graft.core.ManifestTable.currentVersion(spark, repA) <
      graft.core.ManifestTable.currentVersion(spark, repB),
      "coalescing did not reduce replica commits")
    // idempotence after a coalesced run
    assert(ChangeFeed.catchUp(spark, prod, stA) == 4L)
    assert(stateRows(stA) == recompute(prod))
  }

  test("CDC replica mirrors the producer at every catch-up point; delete-only versions advance the offset; re-runs no-op") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 200).select("doc_id", "lang", "n_chars")
      .localCheckpoint(true)
    val root = tmpDir("graft_cdc_rep")
    val (prod, rep) = (root + "/t", root + "/r")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.select("doc_id", "lang", "n_chars").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    def mirror(clue: String): Unit = {
      val p = rowsOf(graft.core.ManifestTable.read(spark, prod).get)
      val r = rowsOf(ChangeFeed.replica(spark, rep))
      assert(r == p, s"$clue: replica diverged from producer")
    }
    // v0: initial load
    graft.core.ManifestTable.commit(spark, prod,
      docs.filter(col("doc_id") % 3 === 0).withColumn("part", lit("b0")),
      "part", 0L)
    assert(ChangeFeed.replicate(spark, prod, rep, "doc_id", "part") == 0L)
    mirror("initial load")
    // v1+v2 consumed in ONE catch-up
    for (b <- 1 until 3)
      graft.core.ManifestTable.commit(spark, prod,
        docs.filter(col("doc_id") % 3 === b)
          .withColumn("part", lit(s"b$b")), "part", b.toLong)
    assert(ChangeFeed.replicate(spark, prod, rep, "doc_id", "part") == 2L)
    mirror("two-version catch-up")
    // v3: a producer MERGE nets (old row removed, new row added) per key
    // — the replica applies it as an upsert
    graft.core.ManifestTable.merge(spark, prod,
      docs.filter(col("doc_id") % 7 === 0)
        .withColumn("lang", lit("u7"))
        .withColumn("part", concat(lit("b"), col("doc_id") % 3)),
      "doc_id", batchId = 3L)
    ChangeFeed.replicate(spark, prod, rep, "doc_id", "part")
    mirror("merge catch-up")
    assert(ChangeFeed.replica(spark, rep)
      .filter(col("lang") === "u7").count() > 0L)
    // v4: a producer takedown is DELETE-ONLY — rows leave the replica AND
    // the offset still advances (the fence-only commit)
    graft.core.ManifestTable.deleteRows(spark, prod,
      docs.filter(col("doc_id") % 10 === 1).select("doc_id"), "doc_id")
    val vDel = graft.core.ManifestTable.currentVersion(spark, prod)
    assert(ChangeFeed.replicate(spark, prod, rep, "doc_id", "part") == vDel)
    mirror("delete catch-up")
    assert(graft.core.ManifestTable.lastBatch(spark, rep) == vDel,
      "a delete-only version did not advance the replica offset")
    // re-run: nothing to consume, nothing changes
    val repV = graft.core.ManifestTable.currentVersion(spark, rep)
    assert(ChangeFeed.replicate(spark, prod, rep, "doc_id", "part") == vDel)
    assert(graft.core.ManifestTable.currentVersion(spark, rep) == repV,
      "an idle re-run published replica versions")
    mirror("idle re-run")
    // the replica really is a DIFFERENT layout: hash buckets, not lineage
    val repParts = graft.core.ManifestTable.read(spark, rep).get
      .select(col("bucket").cast("string")).distinct().count()
    assert(repParts > 1L, "replica should spread across hash buckets")
  }
}
