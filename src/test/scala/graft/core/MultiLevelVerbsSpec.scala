package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round 18 (VERDICT r17 missing #1): the maintenance/rewrite verbs on
  * MULTI-LEVEL layouts. A `(d, source)` table — the recommended shape
  * for event data since U28 — must compact, TTL, bloom-index, take
  * row-level deletes/merges/deferred deletes and lineage-fold exactly
  * like a single-level one: the rewrite unit is the LEAF partition
  * directory, the TTL unit the first level, and untouched leaves carry
  * their files (and zone maps) forward byte-identically.
  */
class MultiLevelVerbsSpec extends SparkSpec {

  import spark.implicits._

  /** A two-level (d, source) table with `nBatches` INSERTs (= files per
    * leaf), zone maps on k. Returns its rows as (k, v, d, source).
    */
  private def seed(root: String, name: String,
      nBatches: Int = 2): Seq[(Long, String, String, String)] = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (k BIGINT, v STRING, d STRING, " +
      "source STRING) USING `graft-manifest` " +
      s"OPTIONS (path '$root', statsColumns 'k') PARTITIONED BY (d, source)")
    val rows = for {
      b <- 0 until nBatches
      d <- Seq("2024-01-01", "2024-01-02")
      s <- Seq("web", "api")
      i <- 0 until 3
    } yield (1000L * b + 100L * (if (d endsWith "1") 0 else 1) +
      10L * (if (s == "web") 0 else 1) + i, s"v$b$d$s$i", d, s)
    rows.grouped(12).zipWithIndex.foreach { case (batch, _) =>
      batch.toDF("k", "v", "d", "source")
        .createOrReplaceTempView(s"${name}_src")
      spark.sql(s"INSERT INTO $name SELECT * FROM ${name}_src")
    }
    rows
  }

  private def lines(root: String): Seq[String] = {
    val v = ManifestTable.currentVersion(spark, root)
    ManifestTable.readManifest(spark, root, v)._1
  }

  private def contents(name: String): Set[(Long, String, String, String)] =
    spark.sql(s"SELECT k, v, d, source FROM $name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet

  test("optimize compacts each LEAF dir of a nested layout; untouched content, layout and pruning survive") {
    val root = tmpDir("graft_ml_opt") + "/t"
    val rows = seed(root, "graft_ml_opt_t")
    try {
      val before = lines(root)
      assert(before.size == 8, s"expected 2 files x 4 leaves: $before")
      val stats = ManifestTable.optimize(spark, root)
      assert(stats.size == 4 &&
        stats.forall(s => s.inputFiles == 2 && s.outputFiles == 1),
        s"per-leaf fold expected: $stats")
      assert(stats.map(_.partition).sorted == Seq(
        "d=2024-01-01/source=api", "d=2024-01-01/source=web",
        "d=2024-01-02/source=api", "d=2024-01-02/source=web"))
      assert(contents("graft_ml_opt_t") == rows.toSet)
      // both levels still prune after the fold
      val q = spark.sql("SELECT k FROM graft_ml_opt_t " +
        "WHERE d = '2024-01-02' AND source = 'api'")
      assert(q.count() == 6)
      // zone maps regenerated across the fold: the pruned read (a file
      // superset by contract) still answers the row filter exactly
      val pruned = ManifestTable.readPruned(spark, root, "k", 0L, 5L)
      assert(pruned.filter(col("k") <= 5L).count() ==
        rows.count(r => r._1 <= 5L))
    } finally spark.sql("DROP TABLE IF EXISTS graft_ml_opt_t")
  }

  test("deleteRows on a nested layout rewrites ONLY the matched leaf; sibling leaves carry their exact manifest lines") {
    val root = tmpDir("graft_ml_del") + "/t"
    val rows = seed(root, "graft_ml_del_t")
    try {
      val before = lines(root)
      val victim = rows.find(r => r._3 == "2024-01-02" && r._4 == "web").get
      val ds = ManifestTable.deleteRows(
        spark, root, Seq(victim._1).toDF("k"), "k").get
      assert(ds.rowsDeleted == 1L)
      assert(ds.filesScanned < ds.filesTotal,
        s"zone maps must prune the nested detection scan: $ds")
      val after = lines(root)
      val touched = "d=2024-01-02/source=web/"
      assert(before.filterNot(_.startsWith(touched)).toSet ==
        after.filterNot(_.startsWith(touched)).toSet,
        "untouched leaves must carry their files byte-identically")
      assert(after.filter(_.startsWith(touched)).nonEmpty &&
        after.filter(_.startsWith(touched))
          .forall(!before.contains(_)))
      assert(contents("graft_ml_del_t") == rows.toSet - victim)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ml_del_t")
  }

  test("merge on a nested layout: update rewrites the matched leaf, insert appends to its (d, source) target") {
    val root = tmpDir("graft_ml_merge") + "/t"
    val rows = seed(root, "graft_ml_merge_t")
    try {
      val hit = rows.find(r => r._3 == "2024-01-01" && r._4 == "api").get
      val updates = Seq(
        (hit._1, "updated", hit._3, hit._4),
        (999999L, "inserted", "2024-01-03", "web")) // brand-new leaf
        .toDF("k", "v", "d", "source")
      val ms = ManifestTable.merge(
        spark, root, updates, "k", batchId = 100L).get
      assert(ms.rowsUpdated == 1L && ms.rowsInserted == 1L, ms.toString)
      assert(ms.filesScanned < ms.filesTotal,
        s"detection must stay zone-pruned on nested layouts: $ms")
      val expect = rows.toSet - hit +
        ((hit._1, "updated", hit._3, hit._4)) +
        ((999999L, "inserted", "2024-01-03", "web"))
      assert(contents("graft_ml_merge_t") == expect)
      assert(lines(root).exists(_.startsWith("d=2024-01-03/source=web/")),
        "the insert must land in its nested target leaf")
      // the update frame must name EVERY level
      val ex = intercept[IllegalArgumentException] {
        ManifestTable.merge(spark, root,
          Seq((1L, "x", "2024-01-01")).toDF("k", "v", "d"), "k", 101L)
      }
      assert(ex.getMessage.contains("source"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_ml_merge_t")
  }

  test("deferred delete + purge on a nested layout: mask applies immediately, optimize purges only the leaves holding masked rows") {
    val root = tmpDir("graft_ml_dv") + "/t"
    val rows = seed(root, "graft_ml_dv_t")
    try {
      val victim = rows.find(r => r._3 == "2024-01-01" && r._4 == "web").get
      val st = ManifestTable.deleteRowsDeferred(
        spark, root, Seq(victim._1).toDF("k"), "k")
      assert(st.keysRecorded == 1L && st.keysPending == 1L)
      // the mask is live on every read path
      assert(contents("graft_ml_dv_t") == rows.toSet - victim)
      assert(ManifestTable.read(spark, root).get.count() == rows.size - 1L)
      // purge: every leaf folds 2->1; the masked row is physically gone
      val stats = ManifestTable.optimize(spark, root)
      assert(stats.size == 4, stats.toString)
      assert(ManifestTable.pendingDeferredDeletes(spark, root).isEmpty,
        "the purge must clear the mask batches it snapshotted")
      assert(contents("graft_ml_dv_t") == rows.toSet - victim)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ml_dv_t")
  }

  test("dropPartitions TTLs a nested table by its FIRST level, metadata-only") {
    val root = tmpDir("graft_ml_ttl") + "/t"
    val rows = seed(root, "graft_ml_ttl_t")
    try {
      val vBefore = ManifestTable.currentVersion(spark, root)
      val dropped = ManifestTable.dropPartitions(
        spark, root, Seq("2024-01-01")).get
      assert(dropped == 4L, s"2 files x 2 sources under the day: $dropped")
      assert(contents("graft_ml_ttl_t") ==
        rows.filter(_._3 != "2024-01-01").toSet)
      // metadata-only: the dropped day still time-travels
      assert(ManifestTable.readVersion(spark, root, vBefore)
        .filter(col("d") === "2024-01-01").count() == 12L)
      // a second drop of the same day is a no-op
      assert(ManifestTable.dropPartitions(
        spark, root, Seq("2024-01-01")).isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ml_ttl_t")
  }

  test("buildBloomIndex keys nested rel paths correctly; the probe narrows a scattered-key delete") {
    val root = tmpDir("graft_ml_bloom") + "/t"
    val rows = seed(root, "graft_ml_bloom_t")
    try {
      val bs = ManifestTable.buildBloomIndex(spark, root, "k")
      assert(bs.filesIndexed == 8, bs.toString)
      // a rebuild is incremental: nothing new to index
      val bs2 = ManifestTable.buildBloomIndex(spark, root, "k")
      assert(bs2.filesIndexed == 0 && bs2.filesCarried == 8)
      // the sidecar rows key FULL nested rel paths — a probe that finds
      // no row would keep conservatively; instead the delete's detection
      // opens only the victim's file(s)
      val victim = rows.find(r => r._3 == "2024-01-02" && r._4 == "api").get
      val ds = ManifestTable.deleteRows(
        spark, root, Seq(victim._1).toDF("k"), "k").get
      assert(ds.rowsDeleted == 1L)
      assert(ds.filesScanned <= 2,
        s"bloom probe over nested rel paths must narrow detection: $ds")
      assert(contents("graft_ml_bloom_t") == rows.toSet - victim)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ml_bloom_t")
  }

  test("optimizeRewritePartitions folds the lineage level of a nested layout, PRESERVING deeper levels") {
    val root = tmpDir("graft_ml_fold") + "/t"
    // lineage-shaped: first level part=b<N> (one per ingest), second
    // level source — the st18 shape with a semantic axis underneath
    spark.sql("DROP TABLE IF EXISTS graft_ml_fold_t")
    spark.sql("CREATE TABLE graft_ml_fold_t (k BIGINT, v STRING, " +
      "part STRING, source STRING) USING `graft-manifest` " +
      s"OPTIONS (path '$root', statsColumns 'k') " +
      "PARTITIONED BY (part, source)")
    try {
      val rows = for {
        b <- 0 until 3; s <- Seq("web", "api"); i <- 0 until 4
      } yield (100L * b + 10L * (if (s == "web") 0 else 1) + i,
        s"v$b$s$i", s"b$b", s)
      rows.grouped(8).foreach { batch =>
        batch.toDF("k", "v", "part", "source")
          .createOrReplaceTempView("graft_ml_fold_src")
        spark.sql("INSERT INTO graft_ml_fold_t " +
          "SELECT * FROM graft_ml_fold_src")
      }
      val st = ManifestTable.optimizeRewritePartitions(
        spark, root, newValue = "folded").get
      assert(st.partition == "part=folded")
      val after = lines(root)
      assert(after.forall(l => l.startsWith("part=folded/source=")),
        s"the fold must preserve the source level: ${after.take(3)}")
      assert(after.exists(_.startsWith("part=folded/source=web/")) &&
        after.exists(_.startsWith("part=folded/source=api/")))
      val got = spark.sql(
        "SELECT k, v, part, source FROM graft_ml_fold_t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
      assert(got == rows.map(r => (r._1, r._2, r._4)).toSet)
      // the preserved level still prunes
      val q = spark.sql(
        "SELECT k FROM graft_ml_fold_t WHERE source = 'api'")
      assert(q.count() == 12)
      // idempotent second fold: one first-level value left -> no-op
      assert(ManifestTable.optimizeRewritePartitions(
        spark, root, newValue = "folded2").isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ml_fold_t")
  }

  test("history + TIMESTAMP AS OF: every version names its operation and publish time; timestamps address versions") {
    val root = tmpDir("graft_ml_hist") + "/t"
    // a single-level lifecycle (history is layout-agnostic; the verbs
    // here exercise the op names). v0 lands p0 as TWO files so the
    // optimize has something to fold; commits REPLACE touched
    // partitions, so each batch targets its own.
    ManifestTable.commit(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v")
        .withColumn("part", lit("p0")),
      "part", batchId = 0L)
    Thread.sleep(5)
    ManifestTable.commit(spark, root,
      Seq((3L, "c")).toDF("k", "v").withColumn("part", lit("p1")),
      "part", batchId = 1L)
    Thread.sleep(5)
    assert(ManifestTable.deleteRows(
      spark, root, Seq(1L).toDF("k"), "k").nonEmpty)
    Thread.sleep(5)
    // a pending mask makes the optimize a purge — it publishes even on
    // single-file partitions
    ManifestTable.deleteRowsDeferred(spark, root, Seq(2L).toDF("k"), "k")
    ManifestTable.optimize(spark, root)
    Thread.sleep(5)
    ManifestTable.restore(spark, root, toVersion = 1L)
    val h = ManifestTable.history(spark, root)
    assert(h.map(_.version) == Seq(4L, 3L, 2L, 1L, 0L), h.toString)
    assert(h.map(_.operation) ==
      Seq("restore", "optimize", "delete", "commit", "commit"), h.toString)
    assert(h.forall(_.timestampMs.isDefined))
    // publish order is timestamp order (strictly here — the sleeps)
    val ts = h.reverse.map(_.timestampMs.get)
    assert(ts == ts.sorted, s"history timestamps must ascend: $ts")
    // a timestamp between v1 and v2 addresses v1
    val t1 = h.find(_.version == 1L).get.timestampMs.get
    assert(ManifestTable.versionAtTimestamp(spark, root, t1) == 1L)
    assert(ManifestTable.versionAtTimestamp(
      spark, root, t1 + 2L) == 1L) // strictly between publishes
    // Delta's rule: a timestamp after the last commit refuses (round 19
    // — "the table as of tomorrow" is falsified by the next commit)
    val exFuture = intercept[IllegalArgumentException] {
      ManifestTable.versionAtTimestamp(
        spark, root, System.currentTimeMillis() + 60000L)
    }
    assert(exFuture.getMessage.contains("after the last commit"))
    // ... and the last commit's own stamp addresses it exactly
    assert(ManifestTable.versionAtTimestamp(
      spark, root, h.head.timestampMs.get) == 4L)
    // before the first commit: loud refusal
    val t0 = h.find(_.version == 0L).get.timestampMs.get
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.versionAtTimestamp(spark, root, t0 - 1L)
    }
    assert(ex.getMessage.contains("at or before"))
    // the reader option resolves through the same road
    val atV1 = spark.read.format("graft-manifest")
      .option("timestampAsOf", t1.toString).load(root)
    assert(atV1.count() == 3L) // v1 = both commits, pre-delete
    val both = intercept[Exception] {
      spark.read.format("graft-manifest")
        .option("timestampAsOf", t1.toString)
        .option("versionAsOf", "0").load(root).count()
    }
    assert(both.getMessage.contains("not both"))
  }

  test("publish stamps are strictly monotonic per table (the skew-proof clamp behind TIMESTAMP AS OF)") {
    val root = tmpDir("graft_ml_mono") + "/t"
    // NO sleeps: rapid-fire publishes land within the same wall-clock
    // millisecond, where raw System.currentTimeMillis() stamps would tie
    // — the clamp (ts = max(now, prev + 1)) must keep them STRICTLY
    // ascending, so versionAtTimestamp's max-eligible pick is
    // unambiguous even under writer clock skew (round 19, ADVICE r18).
    for (b <- 0 until 6) {
      ManifestTable.commit(spark, root,
        Seq((b.toLong, s"v$b")).toDF("k", "v")
          .withColumn("part", lit(s"p$b")),
        "part", batchId = b.toLong)
    }
    val ts = ManifestTable.history(spark, root)
      .reverse.map(_.timestampMs.get)
    assert(ts.size == 6)
    assert(ts.sliding(2).forall { case Seq(a, b) => a < b },
      s"publish stamps must strictly ascend with versions: $ts")
    // each version's own stamp addresses exactly that version
    val h = ManifestTable.history(spark, root)
    h.foreach { e =>
      assert(ManifestTable.versionAtTimestamp(
        spark, root, e.timestampMs.get) == e.version)
    }
  }

  test("optimize RANGE-CLUSTERS each leaf's rewrite on the primary zone column: pruning survives compaction") {
    val root = tmpDir("graft_ml_rc") + "/t"
    // two batches into ONE leaf, each spanning the full key range — before
    // the round-18 clustering the compacted output files each spanned the
    // full range too and a narrow filter opened all of them. The second
    // batch APPENDS (a commit would replace the touched partition).
    def batch(b: Int) =
      (0 until 2000).map(i =>
        (i.toLong, s"pad-$b-$i-${i * 2654435761L}", "p0"))
        .toDF("k", "pad", "part").repartition(1)
    ManifestTable.commit(spark, root, batch(0), "part", batchId = 0L,
      statsCol = Some("k"))
    batch(1).write.format("graft-manifest")
      .mode("append").option("batchId", "1").save(root)
    // a tiny byte target forces a multi-file compaction output
    val stats = ManifestTable.optimize(spark, root, targetBytes = 8192L)
    assert(stats.nonEmpty && stats.head.outputFiles >= 2,
      s"need a multi-file fold to prove clustering: $stats")
    val q = spark.read.format("graft-manifest").load(root)
      .filter(col("k") < 20L)
    assert(q.count() == 40L)
    val scan = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.isInstanceOf[graft.sources.GraftManifestScan] =>
        b.scan.asInstanceOf[graft.sources.GraftManifestScan]
    }.head
    assert(scan.chosenFiles.size < scan.totalFiles,
      s"range-clustered compaction must keep per-file ranges " +
        s"near-disjoint: opened ${scan.chosenFiles.size} of " +
        s"${scan.totalFiles}")
  }

  test("timestamp addressing: readAtTimestamp and the feed's starting/endingTimestamp windows") {
    val root = tmpDir("graft_ml_tsfeed") + "/t"
    for (b <- 0 until 3) {
      ManifestTable.commit(spark, root,
        Seq((100L * b, s"v$b", s"p$b")).toDF("k", "v", "part"),
        "part", batchId = b.toLong)
      Thread.sleep(5)
    }
    val h = ManifestTable.history(spark, root)
    val t1 = h.find(_.version == 1L).get.timestampMs.get
    // Scala snapshot at t1 = versions 0+1
    assert(ManifestTable.readAtTimestamp(spark, root, t1).count() == 2L)
    // feed since t1 = versions 1..2 (earliest commit not before t1)
    val since = spark.read.format("graft-manifest")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", t1.toString).load(root)
      .select("_commit_version").collect().map(_.getLong(0)).toSet
    assert(since == Set(1L, 2L), since.toString)
    // feed up to t1 = versions 0..1
    val until = spark.read.format("graft-manifest")
      .option("readChangeFeed", "true")
      .option("endingTimestamp", t1.toString).load(root)
      .select("_commit_version").collect().map(_.getLong(0)).toSet
    assert(until == Set(0L, 1L), until.toString)
    // a start beyond the last commit refuses loudly (an empty feed would
    // silently mean "nothing changed")
    val ex = intercept[Exception] {
      spark.read.format("graft-manifest")
        .option("readChangeFeed", "true")
        .option("startingTimestamp",
          (System.currentTimeMillis() + 60000L).toString).load(root)
        .collect()
    }
    assert(ex.getMessage.contains("at or after"), ex.getMessage)
    // both spellings of one endpoint refuse
    val ex2 = intercept[Exception] {
      spark.read.format("graft-manifest")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("startingTimestamp", t1.toString).load(root).collect()
    }
    assert(ex2.getMessage.contains("not both"))
  }

  test("SCOPED optimize compacts only the named prefix's leaves; siblings carry; pending masks refuse the scoped pass") {
    val root = tmpDir("graft_ml_scope") + "/t"
    val rows = seed(root, "graft_ml_scope_t")
    try {
      val before = lines(root)
      // scope = one first-level day: its two leaves fold 2 -> 1 each,
      // the other day's four lines carry byte-identically
      val stats = ManifestTable.optimize(
        spark, root, scope = Some("d=2024-01-01"))
      assert(stats.map(_.partition).sorted == Seq(
        "d=2024-01-01/source=api", "d=2024-01-01/source=web") &&
        stats.forall(s => s.inputFiles == 2 && s.outputFiles == 1),
        stats.toString)
      val after = lines(root)
      assert(before.filterNot(_.startsWith("d=2024-01-01/")).toSet ==
        after.filterNot(_.startsWith("d=2024-01-01/")).toSet,
        "out-of-scope leaves must carry byte-identically")
      assert(contents("graft_ml_scope_t") == rows.toSet)
      // a full-leaf scope works too (no-op now: already single-file)
      assert(ManifestTable.optimize(spark, root,
        scope = Some("d=2024-01-01/source=web")).isEmpty)
      // an unmatched scope refuses loudly (a silent no-op would read as
      // "compacted")
      val ex = intercept[IllegalArgumentException] {
        ManifestTable.optimize(spark, root, scope = Some("d=2099-01-01"))
      }
      assert(ex.getMessage.contains("matches no live partition"))
      // scoped passes are not purge points: pending masks refuse
      ManifestTable.deleteRowsDeferred(
        spark, root, Seq(rows.head._1).toDF("k"), "k")
      val ex2 = intercept[IllegalArgumentException] {
        ManifestTable.optimize(spark, root, scope = Some("d=2024-01-02"))
      }
      assert(ex2.getMessage.contains("unscoped optimize"))
      // the unscoped pass purges as ever
      ManifestTable.optimize(spark, root)
      assert(ManifestTable.pendingDeferredDeletes(spark, root).isEmpty)
      assert(contents("graft_ml_scope_t") == rows.toSet - rows.head)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ml_scope_t")
  }

  test("composite-key merge: the full key tuple matches; rows sharing a leading key stay distinct; dup/null tuples refuse") {
    val root = tmpDir("graft_ml_ck") + "/t"
    // (g, i) is the business key; g alone collides (g=1 twice)
    val base = Seq(
      (1L, 1L, "a", "p0"), (1L, 2L, "b", "p0"),
      (2L, 1L, "c", "p1"), (3L, 1L, "d", "p1"))
    ManifestTable.commit(spark, root,
      base.toDF("g", "i", "v", "part"), "part", batchId = 0L,
      statsCol = Some("g"))
    val updates = Seq(
      (1L, 1L, "updated", "p0"),  // matches ONLY (1,1) — (1,2) survives
      (9L, 9L, "inserted", "p2")) // no match anywhere
      .toDF("g", "i", "v", "part")
    val ms = ManifestTable.merge(
      spark, root, updates, Seq("g", "i"), batchId = 1L,
      beforePublish = ManifestTable.NoHook).get
    assert(ms.rowsUpdated == 1L && ms.rowsInserted == 1L, ms.toString)
    val got = ManifestTable.read(spark, root).get
      .select("g", "i", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 1L, "updated"), (1L, 2L, "b"),
      (2L, 1L, "c"), (3L, 1L, "d"), (9L, 9L, "inserted")))
    // duplicate TUPLES refuse (distinct leading keys alone don't)
    val exDup = intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, root,
        Seq((5L, 5L, "x", "p0"), (5L, 5L, "y", "p0"))
          .toDF("g", "i", "v", "part"), Seq("g", "i"), 2L,
        ManifestTable.NoHook)
    }
    assert(exDup.getMessage.contains("duplicate merge keys"))
    // a null ANYWHERE in the tuple refuses
    val exNull = intercept[IllegalArgumentException] {
      ManifestTable.merge(spark, root,
        Seq((5L, Option.empty[Long], "x", "p0"))
          .toDF("g", "i", "v", "part"), Seq("g", "i"), 2L,
        ManifestTable.NoHook)
    }
    assert(exNull.getMessage.contains("null merge key"))
    // the single-column spelling still works (delegates)
    assert(ManifestTable.merge(spark, root,
      Seq((2L, 7L, "e2", "p1")).toDF("g", "i", "v", "part"),
      "g", batchId = 3L).get.rowsUpdated == 1L)
  }

  test("SQL DELETE with a key list metadata-routes onto deleteRows on a nested layout too") {
    val root = tmpDir("graft_ml_sqldel") + "/t"
    val rows = seed(root, "graft_ml_sqldel_t")
    try {
      val victims = rows.take(2).map(_._1)
      spark.sql("DELETE FROM graft_ml_sqldel_t WHERE k IN (" +
        victims.mkString(", ") + ")")
      assert(contents("graft_ml_sqldel_t") ==
        rows.filterNot(r => victims.contains(r._1)).toSet)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ml_sqldel_t")
  }
}
