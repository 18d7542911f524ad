package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K18 incremental maintenance: the absorb must be EXACTLY a from-scratch
  * build over the union (edge sets, levels, and search results — the
  * mergeable-top-k argument in the object doc), idempotent under
  * redelivery, and must refuse loudly when a touched LSH bucket crosses
  * the cap (the rebuild trigger).
  */
class HierarchicalIndexSpec extends SparkSpec {

  import spark.implicits._

  private val emb = graft.core.Tables.load(spark, sf, "embeddings")
    .filter(col("vec_id") < 200).localCheckpoint(true)

  private def graphRows(path: String, l: Int): Set[(Long, Long)] =
    graft.core.ManifestTable.read(spark, s"$path/graph/level=$l").get
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def levelRows(path: String): Set[(Long, Int)] =
    spark.read.parquet(s"$path/levels").select("id", "level").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

  test("absorb == rebuild: edge sets, levels and search results are bit-identical") {
    val base = emb.filter(col("vec_id") < 140)
    val d1 = emb.filter(col("vec_id") >= 140 && col("vec_id") < 170)
    val d2 = emb.filter(col("vec_id") >= 170)
    val inc = tmpDir("graft_hier_inc")
    HierarchicalIndex.build(base, inc, maxLevel = 2)
    HierarchicalIndex.absorb(spark, inc,
      emb.filter(col("vec_id") < 170), d1, batchId = 1L)
    HierarchicalIndex.absorb(spark, inc, emb, d2, batchId = 2L)
    val full = tmpDir("graft_hier_full")
    HierarchicalIndex.build(emb, full, maxLevel = 2)
    assert(levelRows(inc) == levelRows(full), "levels diverge from rebuild")
    for (l <- 0 until 2) {
      val (gi, gf) = (graphRows(inc, l), graphRows(full, l))
      assert(gi == gf,
        s"level-$l edges diverge: absorbed-only=${(gi -- gf).take(5)}, " +
          s"rebuilt-only=${(gf -- gi).take(5)}")
    }
    val qids = Seq(0L, 1L, 2L)
    val (ri, bi) = HierarchicalIndex.searchRun(spark, inc, emb, qids, 10)
    val (rf, bf) = HierarchicalIndex.searchRun(spark, full, emb, qids, 10)
    assert(bi == bf, s"visited budgets diverge: $bi vs $bf")
    assert(ri.exceptAll(rf).isEmpty && rf.exceptAll(ri).isEmpty,
      "search over the absorbed pyramid diverges from the rebuilt one")
  }

  test("absorb: a redelivered batch no-ops on the manifest fence") {
    val base = emb.filter(col("vec_id") < 160)
    val d = emb.filter(col("vec_id") >= 160)
    val path = tmpDir("graft_hier_retry")
    HierarchicalIndex.build(base, path)
    HierarchicalIndex.absorb(spark, path, emb, d, batchId = 1L)
    val before = graphRows(path, 0)
    HierarchicalIndex.absorb(spark, path, emb, d, batchId = 1L) // crash-retry
    assert(graphRows(path, 0) == before, "redelivered absorb mutated the graph")
    assert(graft.core.ManifestTable.lastBatch(
      spark, s"$path/graph/level=0") == 1L)
  }

  test("optimize: fold keeps searches and later absorbs exact; delete purge clears the mask") {
    val base = emb.filter(col("vec_id") < 140)
    val d1 = emb.filter(col("vec_id") >= 140 && col("vec_id") < 170)
    val d2 = emb.filter(col("vec_id") >= 170)
    val c170 = emb.filter(col("vec_id") < 170)
    val path = tmpDir("graft_hier_opt")
    HierarchicalIndex.build(base, path)
    HierarchicalIndex.absorb(spark, path, c170, d1, batchId = 1L)
    val qids = Seq(0L, 1L, 2L)
    val pre = HierarchicalIndex.searchTopKCosine(spark, path, c170, qids)
      .localCheckpoint(true) // materialize BEFORE the fold relists files
    val stats = HierarchicalIndex.optimize(spark, path)
    assert(stats.nonEmpty && stats.forall(s => s.outputFiles <= s.inputFiles),
      s"fold did nothing: $stats")
    val post = HierarchicalIndex.searchTopKCosine(spark, path, c170, qids)
    assert(post.exceptAll(pre).isEmpty && pre.exceptAll(post).isEmpty,
      "search diverged across the fold")
    // an absorb AFTER the fold must still equal the from-scratch build
    HierarchicalIndex.absorb(spark, path, emb, d2, batchId = 2L)
    val ref = tmpDir("graft_hier_opt_ref")
    HierarchicalIndex.build(emb, ref)
    val (ra, ba) = HierarchicalIndex.searchRun(spark, path, emb, qids, 10)
    val (rr, br) = HierarchicalIndex.searchRun(spark, ref, emb, qids, 10)
    assert(ba == br && ra.exceptAll(rr).isEmpty && rr.exceptAll(ra).isEmpty,
      "absorb after the fold diverged from the rebuild")
    // delete then fold = PHYSICAL purge: mask cleared, dead rows gone
    val surv = emb.filter(col("vec_id") =!= 7L)
    HierarchicalIndex.delete(spark, path, surv,
      emb.filter(col("vec_id") === 7L).select("vec_id"), 3L, "vec_id")
    assert(graft.core.Tombstones.read(spark, path).isDefined)
    HierarchicalIndex.optimize(spark, path)
    assert(graft.core.Tombstones.read(spark, path).isEmpty,
      "fold must clear the mask after the physical drop")
    assert(spark.read.parquet(s"$path/bands/level=0")
      .filter(col("id") === 7L).isEmpty, "dead band rows survived the purge")
    assert(spark.read.parquet(s"$path/levels")
      .filter(col("id") === 7L).isEmpty, "dead level row survived the purge")
    val refS = tmpDir("graft_hier_opt_surv")
    HierarchicalIndex.build(surv, refS)
    val (rd, bd) = HierarchicalIndex.searchRun(spark, path, surv, qids, 10)
    val (rs, bs) = HierarchicalIndex.searchRun(spark, refS, surv, qids, 10)
    assert(bd == bs && rd.exceptAll(rs).isEmpty && rs.exceptAll(rd).isEmpty,
      "post-purge search diverged from the survivor rebuild")
  }

  test("delete == rebuild over survivors: edges and search results match exactly") {
    // dead set spans both layers (md5-level draw over the id range) so the
    // coarse-layer rewrite path runs too
    val deadIds = Set(3L, 14L, 25L, 36L, 47L, 58L, 69L, 80L)
    val surv = emb.filter(!col("vec_id").isin(deadIds.toSeq: _*))
    val path = tmpDir("graft_hier_del")
    HierarchicalIndex.build(emb, path, maxLevel = 2)
    HierarchicalIndex.delete(spark, path, surv,
      emb.filter(col("vec_id").isin(deadIds.toSeq: _*)).select("vec_id"),
      batchId = 1L, idCol = "vec_id")
    val ref = tmpDir("graft_hier_surv")
    HierarchicalIndex.build(surv, ref, maxLevel = 2)
    for (l <- 0 until 2) {
      val (gd, gr) = (graphRows(path, l), graphRows(ref, l))
      assert(gd == gr,
        s"level-$l edges diverge from the survivor rebuild: " +
          s"deleted-only=${(gd -- gr).take(5)}, rebuilt-only=${(gr -- gd).take(5)}")
    }
    val qids = Seq(0L, 1L, 2L)
    val (rd, bd) = HierarchicalIndex.searchRun(spark, path, surv, qids, 10)
    val (rr, br) = HierarchicalIndex.searchRun(spark, ref, surv, qids, 10)
    assert(bd == br, s"visited budgets diverge: $bd vs $br")
    assert(rd.exceptAll(rr).isEmpty && rr.exceptAll(rd).isEmpty,
      "search over the deleted pyramid diverges from the survivor rebuild")
    assert(rd.filter(col("neighbor_id").isin(deadIds.toSeq: _*)).isEmpty,
      "a deleted id surfaced in the post-delete search")
  }

  test("delete == rebuild at maxLevel 3: the concurrent upper-level rewrites stay exact") {
    // three layers → TWO upper levels rewrite concurrently (the round-21
    // §2.6 overlap); the rebuild equivalence must hold regardless of which
    // level's jobs finish first, and level 0 still commits last (fence)
    val deadIds = Set(3L, 14L, 25L, 36L, 47L, 58L, 69L, 80L)
    val surv = emb.filter(!col("vec_id").isin(deadIds.toSeq: _*))
    val path = tmpDir("graft_hier_del3")
    HierarchicalIndex.build(emb, path, maxLevel = 3)
    HierarchicalIndex.delete(spark, path, surv,
      emb.filter(col("vec_id").isin(deadIds.toSeq: _*)).select("vec_id"),
      batchId = 1L, idCol = "vec_id")
    val ref = tmpDir("graft_hier_surv3")
    HierarchicalIndex.build(surv, ref, maxLevel = 3)
    for (l <- 0 until 3) {
      val (gd, gr) = (graphRows(path, l), graphRows(ref, l))
      assert(gd == gr,
        s"level-$l edges diverge from the survivor rebuild: " +
          s"deleted-only=${(gd -- gr).take(5)}, rebuilt-only=${(gr -- gd).take(5)}")
    }
    val qids = Seq(0L, 1L, 2L)
    val (rd, bd) = HierarchicalIndex.searchRun(spark, path, surv, qids, 10)
    val (rr, br) = HierarchicalIndex.searchRun(spark, ref, surv, qids, 10)
    assert(bd == br, s"visited budgets diverge: $bd vs $br")
    assert(rd.exceptAll(rr).isEmpty && rr.exceptAll(rd).isEmpty,
      "search over the deleted pyramid diverges from the survivor rebuild")
  }

  test("optimize defers the tombstone fold while a delete's rewrite is unredeemed (crash between mask and commit)") {
    val path = tmpDir("graft_hier_crashdel")
    HierarchicalIndex.build(emb, path)
    val deadIds = Seq(5L, 16L)
    val surv = emb.filter(!col("vec_id").isin(deadIds: _*))
    val dead = emb.filter(col("vec_id").isin(deadIds: _*)).select("vec_id")
    // CRASH EMULATION: the delete's first durable step (the mask) landed,
    // the graph rewrite did not — exactly what delete() leaves behind when
    // it dies between Tombstones.add and its level-0 commit
    graft.core.Tombstones.add(spark, path,
      dead.select(col("vec_id").as("id")), "id", "d1")
    // a maintenance fold arriving NOW must not purge-and-clear: absorbing
    // the mask would empty the dead bands, so the replayed delete would
    // find nothing to rewrite and the dead edges would outlive their mask
    HierarchicalIndex.optimize(spark, path)
    assert(graft.core.Tombstones.read(spark, path).isDefined,
      "the fold absorbed a mask whose graph rewrite never landed")
    // masked search stays dead-free meanwhile
    val masked = HierarchicalIndex.searchTopKCosine(
      spark, path, surv, Seq(0L, 1L), 10)
    assert(masked.filter(col("neighbor_id").isin(deadIds: _*)).isEmpty,
      "a dead id surfaced while the delete was unredeemed")
    // the REPLAYED delete still finds its dead bands and lands
    HierarchicalIndex.delete(spark, path, surv, dead, 1L, "vec_id")
    // ...after which the fold purges and clears as usual
    HierarchicalIndex.optimize(spark, path)
    assert(graft.core.Tombstones.read(spark, path).isEmpty,
      "post-redemption fold failed to clear the mask")
    // and the healed pyramid equals the survivor rebuild — the dead edges
    // are really gone, not just masked
    val ref = tmpDir("graft_hier_crashdel_ref")
    HierarchicalIndex.build(surv, ref)
    assert(graphRows(path, 0) == graphRows(ref, 0),
      "healed pyramid diverges from the survivor rebuild")
  }

  test("delete: a redelivered batch no-ops on the manifest fence") {
    val path = tmpDir("graft_hier_del_retry")
    HierarchicalIndex.build(emb, path)
    val surv = emb.filter(col("vec_id") =!= 7L)
    HierarchicalIndex.delete(spark, path, surv,
      emb.filter(col("vec_id") === 7L).select("vec_id"), 1L, "vec_id")
    val before = graphRows(path, 0)
    HierarchicalIndex.delete(spark, path, surv,
      emb.filter(col("vec_id") === 7L).select("vec_id"), 1L, "vec_id")
    assert(graphRows(path, 0) == before, "redelivered delete mutated the graph")
  }

  test("absorb after delete == build over survivors-plus-delta") {
    val base = emb.filter(col("vec_id") < 160)
    val path = tmpDir("graft_hier_del_abs")
    HierarchicalIndex.build(base, path)
    val deadIds = Seq(5L, 16L, 27L)
    val surv = base.filter(!col("vec_id").isin(deadIds: _*))
    HierarchicalIndex.delete(spark, path, surv,
      base.filter(col("vec_id").isin(deadIds: _*)).select("vec_id"),
      1L, "vec_id")
    val delta = emb.filter(col("vec_id") >= 160)
    val frame = surv.unionByName(delta)
    HierarchicalIndex.absorb(spark, path, frame, delta, batchId = 2L)
    val ref = tmpDir("graft_hier_del_abs_ref")
    HierarchicalIndex.build(frame, ref)
    val qids = Seq(0L, 1L, 2L)
    val (ra, ba) = HierarchicalIndex.searchRun(spark, path, frame, qids, 10)
    val (rr, br) = HierarchicalIndex.searchRun(spark, ref, frame, qids, 10)
    assert(ba == br, s"visited budgets diverge: $ba vs $br")
    assert(ra.exceptAll(rr).isEmpty && rr.exceptAll(ra).isEmpty,
      "absorb over the deleted pyramid diverges from the survivor+delta build")
  }

  test("delete refuses when a dead-containing bucket is over the cap") {
    // three identical vectors co-bucket everywhere; cap=2 means their
    // bucket was sub-salted at build time — removal can't replay the
    // salting, so the delete must say REBUILD
    val twinRow = emb.filter(col("vec_id") === 7).select("embedding")
      .collect().head.getSeq[Float](0)
    val twins = Seq((10007L, twinRow), (20007L, twinRow), (30007L, twinRow))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val corpus = emb.filter(col("vec_id") < 100)
      .unionByName(twins.select(emb.columns.map(col): _*))
    val path = tmpDir("graft_hier_del_cap")
    HierarchicalIndex.build(corpus, path, bucketCap = 2)
    val ex = intercept[IllegalStateException] {
      HierarchicalIndex.delete(spark, path,
        corpus.filter(col("vec_id") =!= 10007L),
        corpus.filter(col("vec_id") === 10007L).select("vec_id"),
        1L, "vec_id")
    }
    assert(ex.getMessage.contains("REBUILD"),
      s"refusal must name the rebuild trigger: ${ex.getMessage}")
  }

  test("adaptive band width: the layer law, meta persistence, and fixed-width identity at spec scale") {
    // the per-layer law: n >> 4l geometric decay, Similarity clamps [4,16]
    assert(HierarchicalIndex.layerBits(0, 18, 200L, 0) == 18 * 4)
    assert(HierarchicalIndex.layerBits(0, 18, 20000L, 0) == 18 * 8,
      "the sf1 corpus resolves to width 8 (the round-15 scale fix)")
    assert(HierarchicalIndex.layerBits(0, 18, 20000L, 1) == 18 * 4,
      "layer 1 anchors to n/16 — expected occupancy constant per layer")
    assert(HierarchicalIndex.layerBits(72, 18, 20000L, 0) == 72,
      "an explicit bits pins every layer")
    // at spec scale (n <= 2048) the adaptive default IS the fixed 72/18
    // parameterization — graphs, meta width, and searches bit-identical
    val ad = tmpDir("graft_hier_ad")
    val fx = tmpDir("graft_hier_fx")
    HierarchicalIndex.build(emb, ad)
    HierarchicalIndex.build(emb, fx, bits = 72)
    assert(graphRows(ad, 0) == graphRows(fx, 0),
      "adaptive-at-clamp diverged from the fixed 72-bit build")
    assert(spark.read.parquet(s"$ad/meta").head().getAs[Long]("width_count")
      == emb.count(), "meta must persist the width anchor count")
  }

  test("absorb bands its delta at the STORED width (rebuild-at-stored-params contract)") {
    // widthCount=5000 forces width 6 (108 bits) — NOT what either corpus
    // count resolves to, so this passes only if absorb re-derives the
    // width from meta instead of re-banding at its own scale's width
    val base = emb.filter(col("vec_id") < 160)
    val delta = emb.filter(col("vec_id") >= 160)
    val inc = tmpDir("graft_hier_wc_inc")
    HierarchicalIndex.build(base, inc, widthCount = 5000L)
    HierarchicalIndex.absorb(spark, inc, emb, delta, batchId = 1L)
    val full = tmpDir("graft_hier_wc_full")
    HierarchicalIndex.build(emb, full, widthCount = 5000L)
    assert(graphRows(inc, 0) == graphRows(full, 0),
      "absorb at a hinted width diverged from the rebuild at that width")
    val qids = Seq(0L, 1L, 2L)
    val (ri, bi) = HierarchicalIndex.searchRun(spark, inc, emb, qids, 10)
    val (rf, bf) = HierarchicalIndex.searchRun(spark, full, emb, qids, 10)
    assert(bi == bf && ri.exceptAll(rf).isEmpty && rf.exceptAll(ri).isEmpty,
      "hinted-width search diverged between absorbed and rebuilt pyramids")
  }

  test("absorb refuses past the bucket cap with the rebuild instruction") {
    // three identical vectors share every band bucket: with cap=2 the
    // delta's twins push their bucket to 3 > cap — exact mergeability is
    // gone and the absorb must say REBUILD rather than silently degrade
    val base = emb.filter(col("vec_id") < 100)
    val path = tmpDir("graft_hier_cap")
    HierarchicalIndex.build(base, path, bucketCap = 2)
    val twinRow = emb.filter(col("vec_id") === 7).select("embedding")
      .collect().head.getSeq[Float](0)
    val twins = Seq((10007L, twinRow), (20007L, twinRow))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalStateException] {
      HierarchicalIndex.absorb(spark, path,
        base.unionByName(twins.withColumn("label", lit(0))
          .select(base.columns.map(col): _*)),
        twins, batchId = 1L)
    }
    assert(ex.getMessage.contains("REBUILD"),
      s"refusal must name the rebuild trigger: ${ex.getMessage}")
  }
}
