package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST21: an INCREMENTAL CONSUMER maintained purely from the manifest
  * table's change-data feed ([[graft.core.ManifestTable.changes]] — U11)
  * — the downstream half of the CDF story, which u11/u11b gate as reads
  * and this object turns into a maintained STATE. The canonical shape of
  * every Delta-CDF / Iceberg-incremental downstream job: poll the
  * producer's version, apply the net row delta to an aggregate, record
  * the consumed offset durably, repeat.
  *
  * The state here is a per-language rollup (`lang, n_docs, chars_total`)
  * over a document table — deliberately the simplest aggregate that
  * exercises every hard part of the contract:
  *
  *  - DELETES: a producer `deleteRows` version nets negative — the
  *    consumer subtracts `removed EXCEPT`-side counts, never re-scans;
  *  - SCHEMA EVOLUTION: a catch-up step BEFORE the producer recorded
  *    `n_chars` sees frames without the column (contributes 0), steps
  *    after see old files null-filled under the evolved schema — the
  *    consumer handles both regimes, as every long-lived downstream job
  *    eventually must;
  *  - EXACTLY-ONCE OFFSETS: the consumer's own state table records the
  *    last consumed producer version as its manifest BATCH id — the same
  *    fence the streamed ingests use. A crash after the state commit
  *    resumes at the next version; a crash before re-reads the same
  *    delta and the fence makes the re-commit a no-op. No side channel,
  *    no separate offset store.
  *
  * Scale shape: each catch-up step reads exactly the changed files (the
  * U11 guarantee — cost tracks the delta, never the table), the delta
  * aggregate is one partial-then-final shuffle keyed by the state key,
  * and the state rewrite touches only the buckets holding changed keys
  * (declared-touched commit). State size tracks key cardinality, not
  * corpus size; catch-up work tracks the delta. Consecutive producer
  * versions with no schema boundary between them COALESCE into one net
  * delta and one state commit (round 15 — a consumer far behind pays
  * per same-schema run, not per version; `coalesce = false` restores
  * the per-version path, value-identical and spec-pinned).
  */
object ChangeFeed {

  /** ROW-LEVEL PRE/POST IMAGES over the change feed (round 19 — VERDICT
    * r18 missing #4 / SURVEY §9 #3, Delta's `update_preimage`/
    * `update_postimage` pairing): the file-level feed emits a rewrite
    * version's removed and added files' rows wholesale; this consumer
    * KEY-JOINS each keyed version's delete × insert sides into row
    * images, so a downstream audit sees UPDATES as updates:
    *
    *  - versions whose header records an `opKey` (the keyed verbs —
    *    merge, deleteRows — stamp their key columns at publish) pair
    *    delete/insert rows sharing the key: value-changed pairs emit
    *    `update_preimage` + `update_postimage`, value-IDENTICAL pairs
    *    drop entirely (they are carried rows a file rewrite re-emitted,
    *    not changes), unmatched sides stay `delete`/`insert`;
    *  - a key that appears more than once on a side within one version
    *    falls back to plain delete+insert for that key (no row identity
    *    to pair on — the Delta caveat, stated rather than guessed);
    *  - versions with no recorded key (appends, optimize, SQL COW with
    *    arbitrary conditions) pass through unchanged.
    *
    * Scale shape: one shuffle keyed by (key, version) over the CHANGED
    * rows only — cost tracks the delta like every feed consumer; the
    * pairing is a declarative full-outer join Catalyst plans (broadcast
    * under AQE when a side is small), never a driver loop.
    */
  def rowImages(
      spark: SparkSession,
      root: String,
      startingVersion: Long = 0L,
      endingVersion: Option[Long] = None): DataFrame = {
    val feed0 = spark.read.format("graft-manifest")
      .option("readChangeFeed", "true")
      .option("startingVersion", startingVersion.toString)
    val feed = endingVersion
      .map(v => feed0.option("endingVersion", v.toString))
      .getOrElse(feed0).load(root)
    val hist = graft.core.ManifestTable.history(spark, root)
      .filter(e => e.version >= startingVersion &&
        endingVersion.forall(e.version <= _))
    val keyedVers: Map[Seq[String], Seq[Long]] = hist
      .filter(_.opKey.nonEmpty).groupBy(_.opKey)
      .view.mapValues(_.map(_.version)).toMap
    if (keyedVers.isEmpty) return feed
    val allKeyed = keyedVers.values.flatten.toSeq
    val plain = feed.filter(
      !col("_commit_version").isin(allKeyed: _*))
    val dataCols = feed.columns.filterNot(c =>
      c == "_change_type" || c == "_commit_version" ||
        c == "_commit_timestamp").toSeq
    val paired = keyedVers.map { case (keyCols, vers) =>
      val sub = feed.filter(col("_commit_version").isin(vers: _*))
      val keyAndVer = keyCols :+ "_commit_version"
      // PAIRABILITY decided by an aggregate FIRST (ADVICE r19: joining
      // the raw sides full-outer fanned out m×n for duplicate keys
      // before the per-side-count fallback could fire, re-emitting each
      // side's rows once per opposite-side row — 2 deletes × 1 insert
      // emitted the insert twice). Only keys with EXACTLY one row per
      // side enter the join (1:1 by construction, no fan-out);
      // everything else — unmatched sides, duplicate keys, NULL key
      // values (no row identity either way) — re-emits its rows
      // VERBATIM through the anti-join.
      val counts = sub.groupBy(keyAndVer.map(col): _*)
        .agg(
          sum(when(col("_change_type") === "delete", 1L).otherwise(0L))
            .as("__pre_n"),
          sum(when(col("_change_type") === "insert", 1L).otherwise(0L))
            .as("__post_n"))
      val pairableKeys = counts
        .filter(col("__pre_n") === 1 && col("__post_n") === 1)
        .select(keyAndVer.map(col): _*)
      // null keys never equi-match: their rows fall to the anti side —
      // verbatim, exactly the fallback they need
      val passthrough = sub.join(pairableKeys, keyAndVer, "left_anti")
      val pairRows = sub.join(pairableKeys, keyAndVer, "left_semi")
      def side(ct: String, tag: String): DataFrame =
        pairRows.filter(col("_change_type") === ct)
          .withColumn(s"__$tag",
            struct(dataCols.map(col) :+
              col("_commit_timestamp").as("__cts"): _*))
          .select((keyCols.map(col) :+ col("_commit_version") :+
            col(s"__$tag")): _*)
      val joined = side("delete", "pre")
        .join(side("insert", "post"), keyAndVer, "inner")
      // a carried row the file rewrite re-emitted — not a change
      val notCarried = joined.filter(!(col("__pre") <=> col("__post")))
      val exploded = notCarried.select(
        col("_commit_version"),
        explode(array(
          struct(lit("update_preimage").as("__ct"),
            col("__pre").as("__row")),
          struct(lit("update_postimage").as("__ct"),
            col("__post").as("__row")))).as("__e"))
      val pairsOut = exploded.select(
        dataCols.map(c => col(s"__e.__row.$c").as(c)) ++ Seq(
          col("__e.__ct").as("_change_type"),
          col("_commit_version"),
          col("__e.__row.__cts").as("_commit_timestamp")): _*)
      pairsOut.unionByName(passthrough.select(
        (dataCols ++ Seq("_change_type", "_commit_version",
          "_commit_timestamp")).map(col): _*))
    }.reduce(_ unionByName _)
    plain.unionByName(paired)
  }

  /** State-table bucket count (pmod of a stable key hash). */
  val StateBuckets = 8

  private def keyBucket(c: org.apache.spark.sql.Column) =
    pmod(abs(hash(c)), lit(StateBuckets)).cast("int")

  /** Per-lang (docs, chars) contribution of one side of a feed step.
    * Frames from steps before the producer's schema evolution lack
    * `n_chars` entirely; evolved steps null-fill old files — both read
    * as zero chars.
    */
  private def sideCounts(df: DataFrame, sign: Int): DataFrame = {
    val chars =
      if (df.columns.contains("n_chars"))
        coalesce(col("n_chars").cast("long"), lit(0L))
      else lit(0L)
    df.groupBy(col("lang"))
      .agg((count(lit(1)) * sign).as("d_docs"),
        (sum(chars) * sign).as("d_chars"))
  }

  /** The initial load and every diff side read RAW
    * ([[graft.core.ManifestTable.readVersionRaw]] / `changes`), never
    * masked: the feed's convention is that a deferred delete surfaces at
    * its purging OPTIMIZE version, so a masked initial load would drop
    * the masked rows once and then the purge version's removed side
    * would subtract them a second time — the state would go negative.
    * The diff base and the diff share one masking convention; this is it.
    *
    * COALESCED apply (round 15): one state commit consumes producer
    * versions (fromExclusive, to] as a single net delta — `changes` is
    * already exact for any version span (manifests are complete
    * snapshots), so a consumer that fell N versions behind pays ONE
    * except-all and ONE state commit per same-schema RUN instead of one
    * commit per version. `fromExclusive < 0` is the initial load: the
    * snapshot AT `to` read raw (≡ v0 plus every net delta through `to`,
    * telescoped). Crash contract unchanged — the state fence records
    * `to`, a re-run re-reads the same span and no-ops.
    */
  private def applyRange(
      spark: SparkSession, producerRoot: String, stateRoot: String,
      fromExclusive: Long, to: Long): Unit = {
    val v = to
    val (added, removed) =
      if (fromExclusive < 0)
        (graft.core.ManifestTable.readVersionRaw(spark, producerRoot, to),
          None)
      else {
        val (a, r) = graft.core.ManifestTable.changes(
          spark, producerRoot, fromExclusive, to)
        (a, Some(r))
      }
    val delta = removed match {
      case None => sideCounts(added, 1)
      case Some(r) => sideCounts(added, 1).unionByName(sideCounts(r, -1))
    }
    val deltaAgg = delta.groupBy("lang")
      .agg(sum(col("d_docs")).as("d_docs"), sum(col("d_chars")).as("d_chars"))
      .localCheckpoint(true) // small: one row per changed key
    if (deltaAgg.isEmpty) {
      // a version with zero net key change (pure OPTIMIZE) still must
      // advance the offset — commit the touched-nothing fence move
      val empty = graft.core.ManifestTable.read(spark, stateRoot) match {
        case Some(st) => st.limit(0)
        case None => deltaAgg.select(col("lang"),
          col("d_docs").as("n_docs"), col("d_chars").as("chars_total"),
          keyBucket(col("lang")).as("bucket"))
      }
      graft.core.ManifestTable.commit(
        spark, stateRoot, empty, "bucket", batchId = v)
      return
    }
    val touched = deltaAgg
      .select(keyBucket(col("lang")).as("b")).distinct()
      .collect().map(_.getInt(0)).sorted // <= StateBuckets
    val prev = graft.core.ManifestTable.read(spark, stateRoot)
    val prevTouched = prev match {
      case Some(st) =>
        st.filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
          .select("lang", "n_docs", "chars_total")
      case None =>
        deltaAgg.limit(0).select(col("lang"),
          col("d_docs").as("n_docs"), col("d_chars").as("chars_total"))
    }
    // merge: full outer on the key — new keys enter, keys the delta
    // zeroes stay as explicit zero rows (state rows never vanish outside
    // a state-table takedown, keeping the merge append-free)
    val merged = prevTouched
      .join(deltaAgg, Seq("lang"), "full_outer")
      .select(col("lang"),
        (coalesce(col("n_docs"), lit(0L)) +
          coalesce(col("d_docs"), lit(0L))).as("n_docs"),
        (coalesce(col("chars_total"), lit(0L)) +
          coalesce(col("d_chars"), lit(0L))).as("chars_total"))
      .withColumn("bucket", keyBucket(col("lang")))
    graft.core.ManifestTable.commit(
      spark, stateRoot, merged, "bucket", batchId = v,
      touchedValues = touched.map(_.toString).toSeq)
  }

  /** Consecutive producer versions starting at `from` (≤ `cur`) whose
    * recorded schemas are all identical to `from`'s — one coalescible
    * RUN. Legacy versions without a recorded schema never coalesce
    * (conservative). Splitting at schema boundaries keeps each commit's
    * column-presence regime clean even though `changes` itself would
    * null-fill across them.
    */
  private def runEnd(
      spark: SparkSession, producerRoot: String,
      from: Long, cur: Long): Long = {
    val sch = graft.core.ManifestTable
      .recordedSchemaJson(spark, producerRoot, from)
    if (sch.isEmpty) return from
    var end = from
    while (end < cur && graft.core.ManifestTable
      .recordedSchemaJson(spark, producerRoot, end + 1) == sch) end += 1
    end
  }

  /** Catch the consumer state up to the producer's current version,
    * returning the offset (last consumed producer version). Consecutive
    * versions with no schema boundary between them COALESCE into one net
    * delta and one state commit (`coalesce = false` restores the
    * one-commit-per-version path — the two are value-identical,
    * spec-pinned; a far-behind consumer pays per RUN, not per version).
    * Idempotent: already-consumed versions no-op on the state table's
    * fence, so re-running after any crash converges.
    */
  def catchUp(
      spark: SparkSession, producerRoot: String, stateRoot: String,
      coalesce: Boolean = true): Long = {
    val cur = graft.core.ManifestTable.currentVersion(spark, producerRoot)
    require(cur >= 0, s"producer at $producerRoot has no committed version")
    val last = graft.core.ManifestTable.lastBatch(spark, stateRoot)
    var v = last + 1
    while (v <= cur) {
      val end = if (coalesce) runEnd(spark, producerRoot, v, cur) else v
      applyRange(spark, producerRoot, stateRoot, v - 1, end)
      v = end + 1
    }
    cur
  }

  /** Replica-table bucket count (hash layout — deliberately DIFFERENT
    * from any producer's lineage partitioning: replication is also a
    * re-partitioning).
    */
  val RepBuckets = 8

  private def repBucket(c: org.apache.spark.sql.Column) =
    pmod(abs(hash(c)), lit(RepBuckets)).cast("int")

  /** ST22: row-level CDC REPLICATION — maintain a hash-bucketed REPLICA
    * of a producer manifest table purely from its change feed, the
    * pipeline every warehouse CDC mirror runs: poll the producer
    * version, turn the net file-level delta into keyed operations, apply
    * them with the table format's own verbs.
    *
    * Per producer version: `removed EXCEPT ALL added` keys with no
    * surviving added row are row-DELETES ([[graft.core.ManifestTable
    * .deleteRows]] on the replica — idempotent by value), every net-added
    * row is an UPSERT ([[graft.core.ManifestTable.merge]] — a producer
    * update nets one removed + one added row for the key, and the merge
    * replaces). EXACTLY-ONCE offsets ride the replica's own fence: the
    * merge (or, for delete-only / zero-net versions, an empty-touched
    * fence commit) lands LAST with `batchId = producer version`, so a
    * crash anywhere re-runs a suffix whose deletes no-op by value and
    * whose merge no-ops on the fence. No side offset store.
    *
    * Scale shape: each step reads exactly the producer's changed files
    * (the U11 guarantee), the except-all net is one shuffle over the
    * delta, the replica delete/merge open only zone/bloom-surviving
    * candidate files and rewrite only buckets holding matched keys —
    * work tracks the delta and the touched buckets, never either table.
    * Layout independence is the point: the replica is hash-bucketed on
    * the key while the producer is lineage-partitioned.
    */
  def replicate(
      spark: SparkSession,
      producerRoot: String,
      replicaRoot: String,
      keyCol: String,
      producerPartitionCol: String,
      coalesce: Boolean = true): Long = {
    val cur = graft.core.ManifestTable.currentVersion(spark, producerRoot)
    require(cur >= 0, s"producer at $producerRoot has no committed version")
    val last = graft.core.ManifestTable.lastBatch(spark, replicaRoot)
    var v = last + 1
    while (v <= cur) {
      val end = if (coalesce) runEnd(spark, producerRoot, v, cur) else v
      replicateRange(spark, producerRoot, replicaRoot, keyCol,
        producerPartitionCol, v - 1, end)
      v = end + 1
    }
    cur
  }

  /** Coalesced replica apply: producer versions (fromExclusive, to] as
    * ONE net delta → one deleteRows + one merge (or fence commit), with
    * `batchId = to` as the consumed offset — a far-behind mirror pays
    * per same-schema run, not per version (round 15; value-identical to
    * the per-version path, spec-pinned). The initial load
    * (`fromExclusive < 0`) reads the snapshot AT `to` raw — the CDC
    * diff-base convention (a pending mask surfaces at its purge version;
    * the replica's copy of the masked rows is then deleted by value
    * there). Crash contract unchanged: deletes no-op by value, the merge
    * no-ops on the fence.
    */
  private def replicateRange(
      spark: SparkSession, producerRoot: String, replicaRoot: String,
      keyCol: String, producerPartitionCol: String,
      fromExclusive: Long, to: Long): Unit = {
    val v = to
    val (added0, removed0) =
      if (fromExclusive < 0)
        (graft.core.ManifestTable.readVersionRaw(spark, producerRoot, to),
          None)
      else {
        val (a, r) = graft.core.ManifestTable.changes(
          spark, producerRoot, fromExclusive, to)
        (a, Some(r))
      }
    // the producer's partition column is its layout, not its data — the
    // replica re-derives its own
    val dataCols = added0.columns.filterNot(_ == producerPartitionCol)
      .map(col).toSeq
    val a = added0.select(dataCols: _*)
    val netAdded = (removed0 match {
      case None => a
      case Some(r) => a.exceptAll(r.select(dataCols: _*))
    }).localCheckpoint(true)
    val delKeys = (removed0 match {
      case None => a.limit(0)
      case Some(r) => r.select(dataCols: _*).exceptAll(a)
    }).select(col(keyCol)).except(netAdded.select(col(keyCol)))
      .localCheckpoint(true)
    // 1. row deletes (idempotent by value — safe under redelivery)
    if (!delKeys.isEmpty)
      graft.core.ManifestTable.deleteRows(spark, replicaRoot, delKeys, keyCol)
    // 2. upserts LAST — their batch id is the consumed-offset fence
    val replicaEmpty = {
      val rv = graft.core.ManifestTable.currentVersion(spark, replicaRoot)
      rv < 0 ||
        graft.core.ManifestTable.readManifest(spark, replicaRoot, rv)._1.isEmpty
    }
    if (!netAdded.isEmpty) {
      val upd = netAdded.withColumn("bucket", repBucket(col(keyCol)))
      if (replicaEmpty)
        graft.core.ManifestTable.commit(
          spark, replicaRoot, upd, "bucket", batchId = v): Unit
      else
        graft.core.ManifestTable.merge(
          spark, replicaRoot, upd, keyCol, batchId = v): Unit
    } else {
      // delete-only or zero-net version: advance the offset fence alone
      val empty =
        if (replicaEmpty)
          netAdded.withColumn("bucket", repBucket(col(keyCol))).limit(0)
        else graft.core.ManifestTable.read(spark, replicaRoot).get.limit(0)
      graft.core.ManifestTable.commit(
        spark, replicaRoot, empty, "bucket", batchId = v): Unit
    }
  }

  /** The replicated table's content (layout column dropped). */
  def replica(spark: SparkSession, replicaRoot: String): DataFrame = {
    val df = graft.core.ManifestTable.read(spark, replicaRoot)
      .getOrElse(throw new IllegalStateException(
        s"no replica at $replicaRoot — run replicate first"))
    df.select(df.columns.filterNot(_ == "bucket").map(col).toSeq: _*)
  }

  /** The maintained state (zero-count rows dropped — a key whose docs all
    * left reads as absent, matching the batch recompute).
    */
  def state(spark: SparkSession, stateRoot: String): DataFrame =
    graft.core.ManifestTable.read(spark, stateRoot)
      .map(_.filter(col("n_docs") > 0).select("lang", "n_docs", "chars_total"))
      .getOrElse(throw new IllegalStateException(
        s"no consumer state at $stateRoot — run catchUp first"))
}
