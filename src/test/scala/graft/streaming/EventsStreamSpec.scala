package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class EventsStreamSpec extends SparkSpec {

  test("AvailableNow replay equals the batch eventsHourly frame exactly") {
    val r = EventsStream.hourlyAvailableNow(spark, sf, "graft_spec_sink")
    val streamed = r.frame
    val batch = Analytics.eventsHourly(Tables.load(spark, sf, "events"))
    assert(streamed.count() > 0)
    assert(r.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${r.batches}")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("userTotalsAvailableNow replay equals batch totals, across >=2 batches") {
    val r = EventsStream.userTotalsAvailableNow(spark, sf, "graft_spec_ut")
    val streamed = r.frame
    val want = Tables.load(spark, sf, "events").groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum(expr("CAST(round(value * 1000) AS BIGINT)")).as("value_milli"))
    assert(r.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${r.batches}")
    assert(streamed.exceptAll(want).isEmpty && want.exceptAll(streamed).isEmpty)
  }

  test("stream-static enrichment equals the batch dim join, across >=2 batches") {
    val r = EventsStream.enrichReplay(spark, sf, "graft_spec_enrich")
    assert(r.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${r.batches}")
    val events = Tables.load(spark, sf, "events")
    val dim = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val want = events.join(dim, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("value_milli"),
        col("c_name"), col("c_mktsegment"))
    val streamed = r.frame
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(want).isEmpty && want.exceptAll(streamed).isEmpty)
  }

  test("chained hourly->daily rollup equals the batch daily aggregate under the day cutoff, >=2 batches") {
    val r = EventsStream.dailyRollupChained(spark, sf, queryName = "graft_spec_daily")
    assert(r.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${r.batches}")
    val events = Tables.load(spark, sf, "events")
    val wm = events.agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val cutoff = new java.sql.Timestamp(wm - 3600L * 1000)
    val want = events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 1000) AS BIGINT)")).as("value_milli"))
      .filter(col("day") + expr("INTERVAL 1 DAY") <= lit(cutoff))
    val got = r.frame
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streamed dedup-index maintenance equals the batch-built index, >=2 batches") {
    val deltaPred = "substring(md5(CAST(doc_id AS STRING)), 1, 1) = '0'"
    val streamedIdx = tmpDir("graft_spec_st11_idx")
    val batches = EventsStream.indexMaintainReplay(
      spark, sf, streamedIdx, s"NOT ($deltaPred)", "graft_spec_idx_maintain")
    assert(batches >= 2,
      s"staged replay must absorb multiple micro-batches, got $batches")
    val batchIdx = tmpDir("graft_spec_d9_idx")
    val docs = graft.core.Tables.load(spark, sf, "documents")
    graft.operators.Dedup.writeIndex(
      docs.filter(!expr(deltaPred)), batchIdx)
    val delta = docs.filter(expr(deltaPred))
    val viaStream = graft.operators.Dedup.incrementalFromIndex(spark, streamedIdx, delta)
    val viaBatch = graft.operators.Dedup.incrementalFromIndex(spark, batchIdx, delta)
    assert(viaStream.exceptAll(viaBatch).isEmpty && viaBatch.exceptAll(viaStream).isEmpty)
  }

  test("streamed cluster maintenance equals batch CC under two batch geometries; fence holds") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val truth = graft.operators.Dedup.clusters(
      docs.select(col("doc_id").as("id")),
      graft.operators.Dedup.minHashNearDup(docs).select("a_id", "b_id"))
      .localCheckpoint(true)

    // geometry 1: the staged replay (2 id-ranged micro-batches)
    val rootA = tmpDir("graft_spec_st19_a")
    val batches = EventsStream.clusterMaintainReplay(
      spark, sf, rootA, "TRUE", "graft_spec_cluster_maintain")
    assert(batches >= 2,
      s"staged replay must absorb multiple micro-batches, got $batches")
    val viaStream = graft.operators.ClusterIndex.labels(spark, rootA)
    assert(viaStream.exceptAll(truth).isEmpty && truth.exceptAll(viaStream).isEmpty,
      "streamed cluster state diverged from batch CC (replay geometry)")

    // geometry 2: a DIFFERENT split (by doc_id parity — interleaved, so
    // cross-batch merges exercise the condensed CC + reps compression)
    val rootB = tmpDir("graft_spec_st19_b")
    graft.operators.ClusterIndex.mergeBatch(
      s"$rootB/index", rootB, docs.filter(col("doc_id") % 2 === 0), 0L)
    graft.operators.ClusterIndex.mergeBatch(
      s"$rootB/index", rootB, docs.filter(col("doc_id") % 2 === 1), 1L)
    val viaParity = graft.operators.ClusterIndex.labels(spark, rootB)
    assert(viaParity.exceptAll(truth).isEmpty && truth.exceptAll(viaParity).isEmpty,
      "streamed cluster state diverged from batch CC (parity geometry)")

    // the manifest fence: re-delivering batch 1 must not change the state
    val before = viaParity.localCheckpoint(true)
    graft.operators.ClusterIndex.mergeBatch(
      s"$rootB/index", rootB, docs.filter(col("doc_id") % 2 === 1), 1L)
    val after = graft.operators.ClusterIndex.labels(spark, rootB)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty,
      "redelivered batch mutated the fenced cluster state")
  }

  test("streamed vector-index maintenance equals the batch-built index, >=2 batches") {
    val deltaPred = "substring(md5(CAST(vec_id AS STRING)), 1, 1) = '0'"
    val emb = Tables.load(spark, sf, "embeddings")
    val streamedIdx = tmpDir("graft_spec_st15_idx")
    val batches = EventsStream.vectorIndexMaintainReplay(
      spark, sf, streamedIdx, s"NOT ($deltaPred)", "graft_spec_vindex_maintain")
    assert(batches >= 2,
      s"staged replay must absorb multiple micro-batches, got $batches")
    val batchIdx = tmpDir("graft_spec_k13_idx")
    graft.operators.VectorIndex.build(emb.filter(!expr(deltaPred)), batchIdx)
    // both indexes then absorb the same delta with their frozen quantizers
    graft.operators.VectorIndex.absorb(
      spark, streamedIdx, emb.filter(expr(deltaPred)), "delta")
    graft.operators.VectorIndex.absorb(
      spark, batchIdx, emb.filter(expr(deltaPred)), "delta")
    val qs = Seq(0L, 1L, 2L)
    val viaStream = graft.operators.VectorIndex.searchTopKCosine(
      spark, streamedIdx, emb, qs, k = 10)
    val viaBatch = graft.operators.VectorIndex.searchTopKCosine(
      spark, batchIdx, emb, qs, k = 10)
    assert(viaStream.count() == 30)
    assert(viaStream.exceptAll(viaBatch).isEmpty && viaBatch.exceptAll(viaStream).isEmpty)
  }

  test("streamed BM25 postings maintenance equals the batch-built index, >=2 batches") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    val streamedIdx = tmpDir("graft_spec_st16_idx")
    val batches = EventsStream.textIndexMaintainReplay(
      spark, sf, streamedIdx, "TRUE", "graft_spec_tindex_maintain")
    assert(batches >= 2,
      s"staged replay must absorb multiple micro-batches, got $batches")
    val viaStream = graft.operators.Retrieval.searchTextIndex(
      spark, streamedIdx, queries, k = 10)
    val inline = graft.operators.Retrieval.bm25TopK(docs, queries, k = 10)
    assert(viaStream.count() == 50)
    assert(viaStream.exceptAll(inline).isEmpty && inline.exceptAll(viaStream).isEmpty)
  }

  test("streamed heavy-hitters maintenance equals the one-pass discovery, >=2 batches") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val summary = tmpDir("graft_spec_st17_hh")
    val batches = EventsStream.heavyHittersMaintainReplay(
      spark, sf, summary, "TRUE", "graft_spec_hh_maintain")
    assert(batches >= 2,
      s"staged replay must absorb multiple micro-batches, got $batches")
    val viaStream = graft.operators.TextAnalysis.searchHeavyHitters(
      spark, summary, docs)
    val inline = graft.operators.TextAnalysis.heavyTokens(docs)
    assert(viaStream.count() == inline.count() && inline.count() > 0)
    assert(viaStream.exceptAll(inline).isEmpty && inline.exceptAll(viaStream).isEmpty)
  }

  test("st23: a mid-stream deferred takedown is purged by the loop's own end-of-run fold") {
    val root = tmpDir("graft_spec_st23_zm") + "/t"
    val batches = EventsStream.zoneMapIngestReplay(spark, sf, root,
      "graft_spec_st23_ingest",
      takedownAtBatch = Some((1L, ss =>
        Tables.load(ss, sf, "events")
          .filter(col("event_id") % 101 === 0).select("event_id"))))
    assert(batches >= 2, s"need the takedown batch to fire, got $batches")
    // the fold purged: no pending mask, and the masked keys are gone —
    // including any that ARRIVED in the takedown batch itself or later
    assert(graft.core.ManifestTable.pendingDeferredDeletes(spark, root)
      .isEmpty, "the end-of-run fold did not purge the mid-stream takedown")
    val got = graft.core.ManifestTable.read(spark, root).get
    assert(got.filter(col("event_id") % 101 === 0).count() == 0L)
    val want = Tables.load(spark, sf, "events")
      .filter(col("event_id") % 101 =!= 0).count()
    assert(got.count() == want,
      "post-fold snapshot diverges from the filtered corpus")
  }

  test("streamed zone-map ingest: time-range read skips files; equals the batch range query") {
    val root = tmpDir("graft_spec_st18_zm") + "/t"
    // 4 time-ordered micro-batches; the replay ENDS with the U8 fold, so
    // the lineage partitions collapse into one `part=opt` partition whose
    // files are range-clustered on ts_micros. A small fold target forces
    // ≥ 2 output files at spec scale so skipping stays provable post-fold.
    spark.conf.set(EventsStream.ReplayFilesConf, "4")
    val batches =
      try EventsStream.zoneMapIngestReplay(spark, sf, root,
        "graft_spec_zm_ingest", foldTargetBytes = 16384L)
      finally spark.conf.set(EventsStream.ReplayFilesConf, "2")
    assert(batches >= 4, s"expected 4 micro-batches, got $batches")
    // the fold collapsed partition COUNT (the U8 point) but not pruning:
    // all live files sit in part=opt, the ingest fence is preserved, and
    // the pre-fold snapshot still time-travels
    val vNow = graft.core.ManifestTable.currentVersion(spark, root)
    val (allFiles, _) = graft.core.ManifestTable.readManifest(spark, root, vNow)
    assert(allFiles.forall(_.startsWith("part=opt/")),
      s"expected one folded lineage partition, got $allFiles")
    assert(graft.core.ManifestTable.lastBatch(spark, root) == batches - 1,
      "the U8 fold advanced the ingest fence")
    assert(graft.core.ManifestTable.readVersion(spark, root, vNow - 1)
      .count() > 0, "pre-fold snapshot lost to the fold")
    val lo = 1705363200000000L
    val hi = lo + 86400L * 1000000L
    val (kept, total) = graft.core.ManifestTable.prunedFiles(
      spark, root, "ts_micros", lo, hi)
    assert(total >= 2 && kept.length < total,
      s"zone maps skipped nothing post-fold: kept ${kept.length} of $total files")
    val got = graft.core.ManifestTable.readPruned(spark, root, "ts_micros", lo, hi)
      .filter(col("ts_micros") >= lo && col("ts_micros") < hi)
      .select("user_id", "ts_micros", "event_id", "event_type", "value_milli")
    val want = Tables.load(spark, sf, "events").selectExpr(
        "user_id", "unix_micros(ts) AS ts_micros", "event_id", "event_type",
        "CAST(round(value * 1000) AS BIGINT) AS value_milli")
      .filter(col("ts_micros") >= lo && col("ts_micros") < hi)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "pruned range read diverges from the plain range scan")

    // st18b: the SECONDARY zone-map column (event_id, ts-correlated in
    // the ordered replay — and still correlated AFTER the ts-range-
    // clustered fold) also provably skips files, and the pruned read
    // equals the plain range scan
    val nEvents = want.unionByName(
      Tables.load(spark, sf, "events").selectExpr(
        "user_id", "unix_micros(ts) AS ts_micros", "event_id", "event_type",
        "CAST(round(value * 1000) AS BIGINT) AS value_milli")
        .filter(col("ts_micros") < lo || col("ts_micros") >= hi)).count()
    val (idLo, idHi) = (0L, nEvents / 8)
    val (keptId, totalId) = graft.core.ManifestTable.prunedFilesMulti(
      spark, root,
      Seq(graft.core.ManifestTable.LongRange("event_id", idLo, idHi)))
    assert(keptId.length < totalId,
      s"secondary column skipped nothing: kept ${keptId.length} of $totalId")
    val gotId = graft.core.ManifestTable.readPrunedMulti(spark, root,
        Seq(graft.core.ManifestTable.LongRange("event_id", idLo, idHi)))
      .filter(col("event_id") >= idLo && col("event_id") <= idHi)
      .select("user_id", "event_id")
    val wantId = Tables.load(spark, sf, "events")
      .filter(col("event_id") >= idLo && col("event_id") <= idHi)
      .select("user_id", "event_id")
    assert(gotId.count() > 0)
    assert(gotId.exceptAll(wantId).isEmpty && wantId.exceptAll(gotId).isEmpty,
      "secondary-column pruned read diverges from the plain range scan")

    // EVOLUTION STEP on the live st18 table: a later ingest batch arrives
    // with an extra column (`ingest_day`) — additive schema evolution
    // inside the zone-mapped lifecycle: fence advances (it IS an ingest),
    // old rows null-fill, and time-range planning still works across the
    // mixed-schema file set
    import spark.implicits._
    val preCount = graft.core.ManifestTable.read(spark, root).get.count()
    graft.core.ManifestTable.commit(spark, root,
      Seq((9999L, hi + 42L, 999999L, "purchase", 1000L, "2024-01-17"))
        .toDF("user_id", "ts_micros", "event_id", "event_type",
          "value_milli", "ingest_day")
        .withColumn("part", lit(s"b$batches")),
      "part", batches)
    assert(graft.core.ManifestTable.lastBatch(spark, root) == batches)
    val evolved = graft.core.ManifestTable.read(spark, root).get
    assert(evolved.count() == preCount + 1)
    assert(evolved.filter(col("ingest_day").isNull).count() == preCount,
      "pre-evolution rows must null-fill the new column")
    val newRow = graft.core.ManifestTable
      .readPruned(spark, root, "ts_micros", hi, hi + 100L)
      .filter(col("ts_micros") === hi + 42L)
    assert(newRow.count() == 1 &&
      newRow.select("ingest_day").collect().head.getString(0) == "2024-01-17",
      "zone-map planning lost the evolved batch")
  }

  test("CDC from the manifest upsert: changelog equals the batch-side snapshot diff; no deletes") {
    val cutoffNanos = 1705363200000000000L // 2024-01-16T00:00:00Z
    val out = EventsStream.cdcUpsertReplay(
      spark, sf, cutoffNanos, "graft_spec_cdc").cache()
    // batch-side truth: last-per-user snapshots on both sides of the cutoff
    val ev = Tables.load(spark, sf, "events").selectExpr(
      "user_id", "ts", "event_id", "event_type",
      "CAST(round(value * 1000) AS BIGINT) AS value_milli")
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .selectExpr("user_id", "unix_micros(ts) AS ts_micros", "event_id",
        "event_type", "value_milli")
    val expected = graft.operators.Joins.snapshotDiff(
      snap(ev.filter(expr("ts < TIMESTAMP '2024-01-16 00:00:00'"))),
      snap(ev), "user_id")
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty,
      "manifest-version changelog diverges from the batch snapshot diff")
    // an upsert sink never deletes; second-half activity must yield updates
    assert(out.filter(col("op") === "D").count() == 0)
    assert(out.filter(col("op") === "U").count() > 0)
  }

  test("CDC degenerate cutoff: all events on one side yields an empty changelog, not a crash") {
    // far-future cutoff: every event lands in the first micro-batch; the
    // second batch (and possibly its manifest version) carries no change —
    // the changelog must be empty whether one or two versions committed
    val out = EventsStream.cdcUpsertReplay(
      spark, sf, Long.MaxValue, "graft_spec_cdc_degenerate")
    assert(out.count() == 0,
      "degenerate cutoff produced a non-empty changelog")
  }

  test("streamed ANALYZE equals the direct full-corpus stats; replayed batch is idempotent") {
    val stateRoot = tmpDir("graft_spec_st13_stats")
    val batches = EventsStream.statsMaintainReplay(
      spark, sf, stateRoot, "graft_spec_stats_maintain")
    assert(batches >= 2,
      s"staged replay must absorb multiple micro-batches, got $batches")
    val streamed = EventsStream.streamedStats(spark, stateRoot)
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val direct = graft.catalog.TableStats.finalizeStats(
      graft.catalog.TableStats.mergeSketches(
        graft.catalog.TableStats.sketch(docs, "documents", "doc_id")))
    assert(streamed.exceptAll(direct).isEmpty && direct.exceptAll(streamed).isEmpty,
      "streamed stats fold diverges from the direct derivation")
    // at-least-once replay: re-absorbing an already-committed batch (same
    // id, same data) leaves the folded stats unchanged
    EventsStream.absorbStatsBatch(stateRoot, docs.limit(40), 0L)
    EventsStream.absorbStatsBatch(stateRoot, docs.limit(40), 0L)
    val refolded = EventsStream.streamedStats(spark, stateRoot)
    // n_rows may change (batch 0's content was replaced by this probe) but
    // the double-absorb itself must be idempotent: fold once more, equal
    val again = EventsStream.streamedStats(spark, stateRoot)
    assert(refolded.exceptAll(again).isEmpty && again.exceptAll(refolded).isEmpty)
  }

  test("userRunningTotals: idle key expires after processing-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("event_id", "user_id", "value")
    // CAUTION: with ProcessingTimeTimeout armed, the engine must keep
    // scheduling batches so pending timeouts can fire even with no input
    // (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is unconditionally
    // true for this conf) — so `processAllAvailable()` NEVER observes
    // quiescence and hangs forever. Assert by polling the sink with a
    // deadline instead, and throttle the perpetual batch loop with a real
    // trigger interval (the default 0 ms trigger would busy-loop state
    // commits back to back).
    val q = EventsStream.userRunningTotals(events, idleTimeout = Some("1 millisecond"))
      .writeStream.format("memory").queryName("graft_mgws_timeout")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("25 milliseconds"))
      .start()
    def rows(): Seq[(Long, Long, Long)] =
      spark.table("graft_mgws_timeout").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def await(what: String)(pred: Seq[(Long, Long, Long)] => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!pred(rows())) {
        assert(q.exception.isEmpty, s"query failed: ${q.exception}")
        assert(System.currentTimeMillis() < deadline,
          s"$what: timed out; sink=${rows().mkString(", ")}")
        Thread.sleep(50)
      }
    }
    try {
      input.addData((1L, 7L, 1.0), (2L, 7L, 2.0))
      // update-mode emission when the data batch lands
      await("pre-expiry totals")(_.contains((7L, 2L, 3000L)))
      // the 1 ms idle timeout lapses; a timeout-driven batch fires the
      // expiry branch, which emits the final totals ONCE MORE and removes
      // the state — the sink accumulates a second identical row
      await("expiry emission")(_.count(_ == (7L, 2L, 3000L)) >= 2)
      // state was removed on expiry → new data restarts from zero
      input.addData((4L, 7L, 0.25))
      await("state must restart from zero after expiry")(_.contains((7L, 1L, 250L)))
    } finally {
      q.stop()
      spark.catalog.dropTempView("graft_mgws_timeout")
    }
  }

  test("streaming dedup drops at-least-once redeliveries exactly") {
    val r = EventsStream.dedupReplay(spark, sf, "graft_spec_dedup")
    val deduped = r.frame
    val want = Tables.load(spark, sf, "events")
    assert(r.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${r.batches}")
    // fixture sanity: the staged source really injected redeliveries
    assert(want.filter(col("event_id") % 7 === 0).count() > 0,
      "no event_id divisible by 7 — duplicate fixture is empty")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = deduped.select(cols.map(col): _*)
    val exp = want.select(cols.map(col): _*)
    assert(got.count() == exp.count(), "dedup must drop every redelivery")
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("stream-stream interval join equals the batch range join") {
    val ar = EventsStream.attributionReplay(spark, sf, queryName = "graft_spec_attr")
    val streamed = ar.frame
    val ev = Tables.load(spark, sf, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val want = views.join(purchases, Seq("user_id"))
      .filter(col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
      .select("user_id", "view_id", "purchase_id", "v_ts", "p_ts")
    assert(ar.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${ar.batches}")
    assert(streamed.count() > 0, "attribution fixture produced no matches")
    assert(streamed.exceptAll(want).isEmpty && want.exceptAll(streamed).isEmpty)
  }

  test("left-outer interval join: matches plus watermark-proven non-conversions") {
    val streamed = EventsStream.attributionOuterReplay(spark, sf, queryName = "graft_spec_attro").frame
    val ev = Tables.load(spark, sf, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val rangeCond = col("user_id") === col("p_user") &&
      col("p_ts") >= col("v_ts") &&
      col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR")
    val matched = views.join(purchases, rangeCond)
    // final GLOBAL watermark = min of the per-side watermarks (each side's
    // max event ts @ ms − 1h; multipleWatermarkPolicy=min) — NOT max(ts)
    // over all events. Only views whose horizon closed STRICTLY before it
    // may emit a null-extended row (empirically pinned, same as the oracle)
    val wm = ev.selectExpr(
      "least(" +
        "date_trunc('MILLISECOND', max(CASE WHEN event_type = 'view' THEN ts END)), " +
        "date_trunc('MILLISECOND', max(CASE WHEN event_type = 'purchase' THEN ts END))" +
        ") - INTERVAL 1 HOUR AS wm")
    val eligibleUnmatched = views.join(purchases, rangeCond, "left_anti")
      .crossJoin(wm)
      .filter(col("v_ts") + expr("INTERVAL 1 HOUR") < col("wm"))
      .select("user_id", "view_id")
    val nulls = streamed.filter(col("purchase_id").isNull).select("user_id", "view_id")
    val hits = streamed.filter(col("purchase_id").isNotNull)
    assert(hits.count() == matched.count(), "matched-pair set diverged from batch join")
    assert(nulls.count() > 0, "fixture should contain non-conversions")
    assert(nulls.exceptAll(eligibleUnmatched).isEmpty &&
      eligibleUnmatched.exceptAll(nulls).isEmpty,
      "null-extended set diverged from the watermark-eligible anti-join")
  }

  test("streaming materialization leaves no catalog residue (file sink, no temp view)") {
    EventsStream.hourlyAvailableNow(spark, sf, "graft_spec_sink2").frame
    assert(!spark.catalog.tableExists("graft_spec_sink2"))
  }

  test("watermarked AvailableNow replay emits exactly the finalized windows") {
    val wr = EventsStream.hourlyWatermarkedAvailableNow(spark, sf)
    val out = wr.frame
    assert(wr.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${wr.batches}")
    val ev = Tables.load(spark, sf, "events")
    // contract: emitted = windows with end <= (max event ts @ ms) - 1h delay
    val cutoff = ev
      .agg(expr("date_trunc('MILLISECOND', max(ts)) - INTERVAL 1 HOUR"))
      .head().getTimestamp(0)
    val expect = Analytics.eventsHourly(ev)
      .filter(expr(s"hour + INTERVAL 1 HOUR <= timestamp'$cutoff'"))
    assert(out.count() > 0)
    assert(out.exceptAll(expect).isEmpty && expect.exceptAll(out).isEmpty)
  }

  test("userRunningTotals: mapGroupsWithState carries state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("event_id", "user_id", "value")
    val q = EventsStream.userRunningTotals(events)
      .writeStream.format("memory").queryName("graft_mgws")
      .outputMode("update").start()
    try {
      input.addData((1L, 7L, 1.0), (2L, 7L, 2.0), (3L, 8L, 5.0))
      q.processAllAvailable()
      val b1 = spark.table("graft_mgws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(b1.contains((7L, 2L, 3000L)) && b1.contains((8L, 1L, 5000L)))
      // second batch: state for user 7 must carry (2 events, 3000 milli)
      input.addData((4L, 7L, 0.5))
      q.processAllAvailable()
      val last = spark.table("graft_mgws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._1 == 7L).maxBy(_._2)
      assert(last == ((7L, 3L, 3500L)))
    } finally q.stop()
  }

  test("userRunningTotals on a batch frame equals groupBy totals") {
    val ev = Tables.load(spark, sf, "events")
    val got = EventsStream.userRunningTotals(ev)
    val want = ev.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum(expr("CAST(round(value * 1000) AS BIGINT)")).as("value_milli"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("readStream -> transform -> parquet writeStream round-trips (file sink e2e)") {
    val outDir = tmpDir("stream_sink") + "/out"
    val ckDir = tmpDir("stream_ck")
    // append-mode file sink: stateless projection (aggregation needs
    // complete/update, which file sinks don't support)
    val q = EventsStream.readEvents(spark, sf)
      .selectExpr("event_id", "ts", "event_type",
        "CAST(round(value * 1000) AS BIGINT) AS value_milli")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val back = spark.read.parquet(outDir)
    val src = Tables.load(spark, sf, "events")
    assert(back.count() == src.count())
    // spot-check content equality on the projected frame
    val expect = src.selectExpr("event_id", "ts", "event_type",
      "CAST(round(value * 1000) AS BIGINT) AS value_milli")
    assert(back.exceptAll(expect).isEmpty && expect.exceptAll(back).isEmpty)
  }

  test("sessionizeAvailableNow: streamed session_window equals the watermark-filtered batch sessions") {
    val r = EventsStream.sessionizeAvailableNow(spark, sf, queryName = "graft_spec_sess")
    assert(r.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${r.batches}")
    val ev = Tables.load(spark, sf, "events")
    // append-mode contract: emitted = sessions with end <= final watermark
    // (max event ts @ ms precision − 1h); still-open sessions are withheld
    val cutoff = ev
      .agg(expr("date_trunc('MILLISECOND', max(ts)) - INTERVAL 1 HOUR"))
      .head().getTimestamp(0)
    val expect = EventsStream.sessionize(ev)
      .filter(expr(s"session_end <= timestamp'$cutoff'"))
    assert(r.frame.count() > 0, "no finalized sessions emitted")
    assert(r.frame.exceptAll(expect).isEmpty && expect.exceptAll(r.frame).isEmpty,
      "streamed sessions diverged from the watermark-filtered batch sessions")
  }

  test("streaming session_window: emission boundary is end <= watermark; state merges across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "value")
    val q = EventsStream.sessionize(events.withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("graft_sess_wm")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    def t(s: String) = Timestamp.valueOf(s)
    def starts(): Seq[Timestamp] =
      spark.table("graft_sess_wm").collect().toSeq.map(_.getTimestamp(0))
    try {
      // batch 1: user 1 opens a session at 10:00 (end 10:30); max ts 11:00
      // puts the post-batch watermark at 10:00 — below the session end, so
      // nothing may emit (processAllAvailable includes the no-data batch
      // the engine runs after a watermark advance)
      mem.addData((t("2024-01-01 10:00:00"), 1L, 1.0),
        (t("2024-01-01 11:00:00"), 2L, 5.0))
      q.processAllAvailable()
      assert(starts().isEmpty,
        "session with end 10:30 > wm 10:00 must stay open")

      // batch 2: user 1's 10:29 event MERGES into the batch-1 session state
      // (cross-batch merging — end extends 10:30 → 10:59); max ts 11:59
      // advances the post-batch watermark to exactly 10:59:00.000 == the
      // merged session's end. Emission here pins the <= boundary (strict-<
      // semantics would withhold it).
      mem.addData((t("2024-01-01 10:29:00"), 1L, 2.0),
        (t("2024-01-01 11:59:00"), 3L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("graft_sess_wm").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(rows.contains((t("2024-01-01 10:00:00"), t("2024-01-01 10:59:00"), 1L, 2L, 3000L)),
        s"merged session ending exactly at the watermark must emit (<= boundary); sink=${rows.mkString(", ")}")
    } finally {
      q.stop()
      spark.catalog.dropTempView("graft_sess_wm")
    }
  }

  test("sessionize: gap merge + session bounds on a hand fixture") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: 3 events within 30min gaps -> one session; 4th after 31min gap
    // -> new session. user 2: single event.
    val ev = Seq(
      (t("2024-01-01 10:00:00"), 1L, 1.0),
      (t("2024-01-01 10:20:00"), 1L, 2.0),
      (t("2024-01-01 10:45:00"), 1L, 3.0),
      (t("2024-01-01 11:16:00"), 1L, 4.0),
      (t("2024-01-01 09:00:00"), 2L, 5.0)
    ).toDF("ts", "user_id", "value")
    val out = EventsStream.sessionize(ev).orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getTimestamp(0) == t("2024-01-01 10:00:00"))
    assert(out(0).getTimestamp(1) == t("2024-01-01 11:15:00")) // last + 30min
    assert(out(0).getLong(3) == 3 && out(0).getLong(4) == 6000L)
    assert(out(1).getTimestamp(0) == t("2024-01-01 11:16:00"))
    assert(out(1).getLong(3) == 1)
    assert(out(2).getLong(2) == 2L && out(2).getLong(3) == 1)
  }

  test("watermark append mode: windows finalize once passed; late rows drop") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val out = EventsStream.hourlyWindowedWatermarked(events)
    val q = out.writeStream
      .format("memory").queryName("graft_wm_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      // batch 1: two rows in [10:00,11:00), one at 11:30 pushing the
      // watermark to 10:30 — nothing finalized yet
      mem.addData((t("2024-01-01 10:00:00"), "click", 1.0),
        (t("2024-01-01 10:30:00"), "click", 2.0),
        (t("2024-01-01 11:30:00"), "view", 5.0))
      q.processAllAvailable()
      assert(spark.table("graft_wm_sink").count() == 0)

      // batch 2: 12:30 row advances the watermark to 11:30 → the [10,11)
      // window finalizes; a 09:10 row is behind the watermark → dropped
      mem.addData((t("2024-01-01 12:30:00"), "view", 7.0),
        (t("2024-01-01 09:10:00"), "click", 100.0))
      q.processAllAvailable()
      val rows = spark.table("graft_wm_sink").collect()
      val hours = rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
      assert(hours.contains(("2024-01-01 10:00:00.0", "click", 2L, 3000L)),
        s"10:00 click window missing or wrong: ${hours.mkString(", ")}")
      assert(!hours.exists(_._1.startsWith("2024-01-01 09")),
        s"late 09:10 row leaked into output: ${hours.mkString(", ")}")
    } finally {
      q.stop()
      spark.catalog.dropTempView("graft_wm_sink")
    }
  }

  test("mergeProfileBatch: untouched buckets survive, touched merge last-wins, fenced + idempotent") {
    import spark.implicits._
    val ts = (sec: Long) => new java.sql.Timestamp(sec * 1000)
    val state = tmpDir("graft_upsert_merge") + "/profile"
    def batch(rows: (Long, Long, Long, String, Long)*) =
      rows.toSeq.toDF("user_id", "__s", "event_id", "event_type", "value_milli")
        .select(col("user_id"), expr("timestamp_seconds(__s)").as("ts"),
          col("event_id"), col("event_type"), col("value_milli"))
    def readState() = graft.core.ManifestTable.read(spark, state).get
      .select("user_id", "ts", "event_id", "event_type", "value_milli")
      .collect().map(r => r.getLong(0) ->
        ((r.getTimestamp(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    // batch A: users 0 (bucket 0) and 1 (bucket 1) of 4
    EventsStream.mergeProfileBatch(state,
      batch((0L, 10L, 100L, "view", 1L), (1L, 10L, 101L, "view", 2L)), 0L, 4)
    // batch B touches ONLY bucket 1: user 0's bucket-0 files are carried
    // forward by the manifest, not rewritten
    EventsStream.mergeProfileBatch(state,
      batch((1L, 20L, 102L, "purchase", 3L)), 1L, 4)
    val afterB = readState()
    assert(afterB(0L) == ((ts(10), 100L, "view", 1L)),
      "untouched bucket lost its rows — manifest did not carry them forward")
    assert(afterB(1L) == ((ts(20), 102L, "purchase", 3L)), "touched bucket not merged")
    // older redelivery as a NEW batch must NOT win (last-writer-wins on ts)
    EventsStream.mergeProfileBatch(state,
      batch((1L, 15L, 103L, "click", 9L)), 2L, 4)
    assert(readState() == afterB, "older event overwrote newer state")
    // redelivered batch id <= committed: the fence skips the write entirely
    val vBefore = graft.core.ManifestTable.currentVersion(spark, state)
    EventsStream.mergeProfileBatch(state,
      batch((1L, 20L, 102L, "purchase", 3L)), 1L, 4)
    assert(graft.core.ManifestTable.currentVersion(spark, state) == vBefore,
      "redelivered batch id committed a new version past the fence")
    assert(readState() == afterB, "replayed batch changed converged state")
  }

  test("upsertReplay: profile table equals latest-event-per-user, across >=2 batches") {
    val r = EventsStream.upsertReplay(spark, sf, "graft_spec_upsert")
    assert(r.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${r.batches}")
    val ev = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type",
        "CAST(round(value * 1000) AS BIGINT) AS value_milli")
    val want = ev
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val got = r.frame
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("mergeRunningBatch: fenced additive folds — replay-safe, crash-heal, untouched buckets intact") {
    import spark.implicits._
    val state = tmpDir("graft_mv_merge") + "/totals"
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      def batch(rows: (Long, Double)*) = rows.toSeq.toDF("user_id", "value")
      def readState() = spark.read.parquet(state)
        .select("user_id", "n_events", "value_milli").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // batch 0: users 0 (bucket 0) and 1 (bucket 1) of 4
      EventsStream.mergeRunningBatch(state, batch((0L, 1.0), (0L, 2.0), (1L, 5.0)), 0L, 4)
      assert(readState() == Map(0L -> ((2L, 3000L)), 1L -> ((1L, 5000L))))
      // batch 1 touches only bucket 1; bucket 0 must be untouched
      EventsStream.mergeRunningBatch(state, batch((1L, 1.0)), 1L, 4)
      val after1 = readState()
      assert(after1 == Map(0L -> ((2L, 3000L)), 1L -> ((2L, 6000L))))
      // REDELIVERY of batch 1 (foreachBatch at-least-once): the fence must
      // reject the double-count an unfenced additive merge would apply
      EventsStream.mergeRunningBatch(state, batch((1L, 1.0)), 1L, 4)
      assert(readState() == after1, "replayed batch double-counted — fence broken")
      // out-of-order stale batch id is also rejected
      EventsStream.mergeRunningBatch(state, batch((1L, 99.0)), 0L, 4)
      assert(readState() == after1, "stale batch id folded in")
      // a NEW user arriving in a replayed-id batch for an untouched bucket
      // still lands (its row has no last_batch yet -> fence passes)
      EventsStream.mergeRunningBatch(state, batch((2L, 7.0)), 1L, 4)
      assert(readState()(2L) == ((1L, 7000L)))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  test("sink state probing resolves file:-URI roots (Hadoop FS, not java.io.File)") {
    import spark.implicits._
    // an explicit file:// URI: java.io.File("file:///...").exists() is
    // false, so a File-based probe would treat existing state as missing
    // and the second fold would RESET the totals instead of accumulating
    val state = "file://" + tmpDir("graft_mv_uri") + "/totals"
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      def batch(rows: (Long, Double)*) = rows.toSeq.toDF("user_id", "value")
      EventsStream.mergeRunningBatch(state, batch((0L, 1.0)), 0L, 2)
      EventsStream.mergeRunningBatch(state, batch((0L, 1.0)), 1L, 2)
      val totals = spark.read.parquet(state)
        .select("n_events", "value_milli").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(totals.toSeq == Seq((2L, 2000L)),
        s"URI-rooted state did not accumulate across batches: ${totals.toSeq}")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  test("runningMvReplay: maintained view equals batch totals, across >=2 batches") {
    val r = EventsStream.runningMvReplay(spark, sf, "graft_spec_mv")
    assert(r.batches >= 2,
      s"staged replay must run multiple micro-batches, got ${r.batches}")
    val want = Tables.load(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 1000) AS BIGINT)")).as("value_milli"))
    val got = r.frame
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
