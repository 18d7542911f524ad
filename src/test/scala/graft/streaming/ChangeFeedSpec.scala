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
}
