package graft.sources

import graft.SparkSpec
import graft.core.ManifestTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL row-level verbs (round 17): DELETE FROM / UPDATE / MERGE INTO on
  * a graft-manifest table must plan onto the format's own machinery —
  * key deletes metadata-route to [[ManifestTable.deleteRows]], everything
  * else goes group-based copy-on-write through
  * [[ManifestTable.replaceFiles]] — with value identity against the
  * Scala verbs and refusal parity (pending masks, time travel,
  * uncommitted tables).
  */
class GraftRowLevelOpsSpec extends SparkSpec {

  import spark.implicits._

  private def fmt(root: String): DataFrame =
    spark.read.format("graft-manifest").load(root)

  /** A 4-lineage-batch documents-shaped table with zone maps on k. */
  private def seed(root: String, statsCol: Option[String] = Some("k")): Unit =
    for (b <- 0 until 4)
      ManifestTable.commit(spark, root,
        (0 until 25).map(i => (100L * b + i, s"s${100 * b + i}", s"b$b"))
          .toDF("k", "s", "part").repartition(1),
        "part", batchId = b.toLong, statsCol = statsCol)

  private def ddl(name: String, root: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (k BIGINT, s STRING, part STRING) " +
      s"USING `graft-manifest` OPTIONS (path '$root')")
  }

  private def graftScans(df: DataFrame): Seq[GraftManifestScan] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[GraftManifestScan] = {
      val here = p match {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[GraftManifestScan] =>
          Seq(b.scan.asInstanceOf[GraftManifestScan])
        case _ => Nil
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def liveFiles(root: String): Set[String] = {
    val v = ManifestTable.currentVersion(spark, root)
    ManifestTable.readManifest(spark, root, v)._1.toSet
  }

  test("DELETE FROM ... WHERE k IN (...) metadata-routes onto deleteRows: untouched partitions carry their files, fence preserved") {
    val root = tmpDir("graft_sql_del") + "/t"
    seed(root)
    ddl("graft_sql_del_t", root)
    try {
      val before = liveFiles(root)
      val fenceBefore = ManifestTable.lastBatch(spark, root)
      spark.sql("DELETE FROM graft_sql_del_t WHERE k IN (3, 107, 108)")
      val expect = (0 until 4).flatMap(b =>
        (0 until 25).map(i => 100L * b + i)).toSet -- Set(3L, 107L, 108L)
      assert(spark.sql("SELECT k FROM graft_sql_del_t").collect()
        .map(_.getLong(0)).toSet == expect)
      // metadata route: only partitions b0 and b1 were rewritten — b2/b3
      // carry the SAME physical files (the deleteRows discipline; a COW
      // rewrite of the whole candidate set would rename them)
      val after = liveFiles(root)
      val untouched = before.filter(f =>
        f.startsWith("part=b2/") || f.startsWith("part=b3/"))
      assert(untouched.subsetOf(after),
        s"untouched partitions were rewritten: ${untouched.diff(after)}")
      assert(ManifestTable.lastBatch(spark, root) == fenceBefore,
        "a delete must not advance the ingest fence")
      // value identity with the Scala verb on a twin table
      val twin = tmpDir("graft_sql_del_twin") + "/t"
      seed(twin)
      ManifestTable.deleteRows(spark, twin,
        Seq(3L, 107L, 108L).toDF("k"), "k")
      assert(fmt(root).select("k", "s", "part").exceptAll(
        ManifestTable.read(spark, twin).get.select("k", "s", "part")).isEmpty)
      // a DELETE matching nothing is a no-op, not an error
      val v = ManifestTable.currentVersion(spark, root)
      spark.sql("DELETE FROM graft_sql_del_t WHERE k IN (999999)")
      assert(ManifestTable.currentVersion(spark, root) == v)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_del_t")
  }

  test("DELETE FROM with a non-key-mappable predicate takes the copy-on-write road and only rewrites candidate files") {
    val root = tmpDir("graft_sql_delcow") + "/t"
    seed(root)
    ddl("graft_sql_delcow_t", root)
    try {
      val before = liveFiles(root)
      // a RANGE predicate on the zone column: not IN/EqualTo-mappable →
      // ReplaceData; static pushdown bounds the candidates to b2's file
      spark.sql(
        "DELETE FROM graft_sql_delcow_t WHERE k >= 200 AND k <= 210 AND s != 's205'")
      val expect = (0 until 4).flatMap(b =>
        (0 until 25).map(i => 100L * b + i)).toSet --
        (200L to 210L).toSet + 205L
      assert(spark.sql("SELECT k FROM graft_sql_delcow_t").collect()
        .map(_.getLong(0)).toSet == expect)
      val after = liveFiles(root)
      // zone pushdown kept the rewrite to partition b2: every other
      // partition's files survive byte-identical
      val untouched = before.filterNot(_.startsWith("part=b2/"))
      assert(untouched.subsetOf(after),
        s"COW delete rewrote beyond its candidates: ${untouched.diff(after)}")
      assert(!before.filter(_.startsWith("part=b2/")).subsetOf(after),
        "the candidate file was not replaced")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_delcow_t")
  }

  test("UPDATE rewrites matched rows in place (copy-on-write), values pinned") {
    val root = tmpDir("graft_sql_upd") + "/t"
    seed(root)
    ddl("graft_sql_upd_t", root)
    try {
      spark.sql("UPDATE graft_sql_upd_t SET s = 'redacted' " +
        "WHERE k % 10 = 7")
      val got = spark.sql("SELECT k, s FROM graft_sql_upd_t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got.size == 100)
      got.foreach { case (k, s) =>
        if (k % 10 == 7) assert(s == "redacted", s"k=$k not updated")
        else assert(s == s"s$k", s"k=$k clobbered: $s")
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_upd_t")
  }

  test("MERGE INTO runs the u15 upsert lifecycle purely in SQL, value-identical to ManifestTable.merge") {
    val root = tmpDir("graft_sql_merge") + "/t"
    val twin = tmpDir("graft_sql_merge_twin") + "/t"
    seed(root); seed(twin)
    ddl("graft_sql_merge_t", root)
    try {
      // the u15 shape: matched rows (k % 7 = 0) get corrected values and
      // MOVE to fresh m* partitions; unmatched (shifted ids) INSERT
      val matched = (0 until 100).map(i => i.toLong).filter(_ % 7 == 0)
        .map(k => (k, "upd", s"m${k % 2}"))
      val inserts = (0 until 100).map(i => i.toLong).filter(_ % 13 == 0)
        .map(k => (k + 10000000L, s"ins$k", s"b${(k + 10000000L) % 4}"))
      val src = (matched ++ inserts).toDF("k", "s", "part")
      src.createOrReplaceTempView("graft_sql_merge_src")
      spark.sql(
        """MERGE INTO graft_sql_merge_t t USING graft_sql_merge_src s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      ManifestTable.merge(spark, twin, src, "k", batchId = 4L)
      val a = fmt(root).select("k", "s", "part")
      val b = ManifestTable.read(spark, twin).get.select("k", "s", "part")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "SQL MERGE diverged from ManifestTable.merge")
      // seed keys are {0..24, 100..124, 200..224, 300..324}: of the
      // "matched" source keys only those present actually match — the
      // rest take the NOT MATCHED insert leg (both engines must agree)
      val tableKeys = (0 until 4).flatMap(b0 =>
        (0 until 25).map(i => 100L * b0 + i)).toSet
      val reallyMatched = matched.map(_._1).count(tableKeys.contains)
      assert(a.count() ==
        100L + (matched.size + inserts.size) - reallyMatched)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_sql_merge_t")
      spark.catalog.dropTempView("graft_sql_merge_src")
    }
  }

  test("refusal parity: pending masks, time travel and uncommitted tables refuse the SQL verbs loudly") {
    val root = tmpDir("graft_sql_refuse") + "/t"
    seed(root)
    ddl("graft_sql_refuse_t", root)
    try {
      ManifestTable.deleteRowsDeferred(spark, root, Seq(5L).toDF("k"), "k")
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      // metadata DELETE reaches deleteRows' own refusal; COW verbs refuse
      // at analysis — both name the purge instruction
      for (stmt <- Seq(
        "DELETE FROM graft_sql_refuse_t WHERE k IN (1, 2)",
        "UPDATE graft_sql_refuse_t SET s = 'x' WHERE k = 1",
        "MERGE INTO graft_sql_refuse_t t USING (SELECT 1L AS k, 'x' AS s, " +
          "'b0' AS part) s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *")) {
        val ex = intercept[Exception] { spark.sql(stmt) }
        assert(chain(ex).exists(_.contains("optimize")),
          s"$stmt: wrong refusal ${chain(ex)}")
      }
      ManifestTable.optimize(spark, root) // purge; verbs work again
      spark.sql("DELETE FROM graft_sql_refuse_t WHERE k IN (1)")
      assert(spark.sql(
        "SELECT count(*) FROM graft_sql_refuse_t").head.getLong(0) == 98L)
      // an uncommitted DDL table refuses row-level verbs
      val root2 = tmpDir("graft_sql_refuse2") + "/t"
      spark.sql("DROP TABLE IF EXISTS graft_sql_refuse_u")
      spark.sql("CREATE TABLE graft_sql_refuse_u (k BIGINT, part STRING) " +
        s"USING `graft-manifest` OPTIONS (path '$root2', partitionCol 'part')")
      val ex2 = intercept[Exception] {
        spark.sql("UPDATE graft_sql_refuse_u SET k = 1 WHERE k = 2")
      }
      assert(chain(ex2).exists(_.contains("committed")),
        s"wrong uncommitted refusal: ${chain(ex2)}")
      spark.sql("DROP TABLE IF EXISTS graft_sql_refuse_u")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_refuse_t")
  }

  test("TRUNCATE TABLE empties the table through the truncate publisher") {
    val root = tmpDir("graft_sql_trunc") + "/t"
    seed(root)
    ddl("graft_sql_trunc_t", root)
    try {
      spark.sql("TRUNCATE TABLE graft_sql_trunc_t")
      assert(spark.sql(
        "SELECT count(*) FROM graft_sql_trunc_t").head.getLong(0) == 0L)
      // time travel still sees the pre-truncate snapshot
      assert(spark.read.format("graft-manifest")
        .option("versionAsOf", "3").load(root).count() == 100L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_trunc_t")
  }

  test("TRUNCATE refuses while a deferred-delete mask is pending (refusal parity with every other rewrite road)") {
    val root = tmpDir("graft_sql_trunc_dv") + "/t"
    seed(root)
    ddl("graft_sql_trunc_dv_t", root)
    try {
      ManifestTable.deleteRowsDeferred(spark, root, Seq(5L).toDF("k"), "k")
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      val ex = intercept[Exception] {
        spark.sql("TRUNCATE TABLE graft_sql_trunc_dv_t")
      }
      assert(chain(ex).exists(_.contains("optimize")),
        s"wrong truncate refusal: ${chain(ex)}")
      // the mask must still apply (the truncate published nothing)
      assert(spark.sql(
        "SELECT count(*) FROM graft_sql_trunc_dv_t").head.getLong(0) == 99L)
      ManifestTable.optimize(spark, root) // purge point
      spark.sql("TRUNCATE TABLE graft_sql_trunc_dv_t")
      assert(spark.sql(
        "SELECT count(*) FROM graft_sql_trunc_dv_t").head.getLong(0) == 0L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_trunc_dv_t")
  }

  test("a row-level statement whose filter matches no files publishes no new version (no vacuum churn)") {
    val root = tmpDir("graft_sql_noop") + "/t"
    seed(root)
    ddl("graft_sql_noop_t", root)
    try {
      val v0 = ManifestTable.currentVersion(spark, root)
      // k = -1 exists nowhere; zone maps prune every candidate file and
      // the runtime group filter keeps zero files — nothing to publish
      spark.sql("UPDATE graft_sql_noop_t SET s = 'x' WHERE k = -1")
      spark.sql("DELETE FROM graft_sql_noop_t WHERE k = -1 AND s = 'no'")
      assert(ManifestTable.currentVersion(spark, root) == v0,
        "a no-match row-level statement must not publish a version")
      assert(spark.sql(
        "SELECT count(*) FROM graft_sql_noop_t").head.getLong(0) == 100L)
      // and a MATCHING one still publishes exactly one
      spark.sql("UPDATE graft_sql_noop_t SET s = 'hit' WHERE k = 3")
      assert(ManifestTable.currentVersion(spark, root) == v0 + 1)
      assert(spark.sql("SELECT s FROM graft_sql_noop_t WHERE k = 3")
        .head.getString(0) == "hit")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_noop_t")
  }

  test("multi-column partitioning: PARTITIONED BY (d, source) nests directories; both levels prune; COW verbs preserve the layout") {
    val root = tmpDir("graft_multipart") + "/t"
    spark.sql("DROP TABLE IF EXISTS graft_mp_t")
    spark.sql("CREATE TABLE graft_mp_t (k BIGINT, v STRING, d STRING, " +
      "source STRING) USING `graft-manifest` " +
      s"OPTIONS (path '$root', statsColumns 'k') " +
      "PARTITIONED BY (d, source)")
    try {
      val rows = for {
        d <- Seq("2024-01-01", "2024-01-02")
        s <- Seq("web", "api")
        i <- 0 until 5
      } yield (s"($d$s$i)".hashCode.toLong.abs % 1000000,
        s"v$d$s$i", d, s)
      rows.toDF("k", "v", "d", "source").createOrReplaceTempView("graft_mp_src")
      spark.sql("INSERT INTO graft_mp_t SELECT * FROM graft_mp_src")
      // nested directories on disk
      assert(new java.io.File(s"$root/d=2024-01-01/source=web").isDirectory,
        "expected nested d=<v>/source=<v> layout")
      // full read round-trips both partition columns
      val all = spark.sql("SELECT k, v, d, source FROM graft_mp_t").collect()
      assert(all.length == 20)
      assert(all.map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet == rows.toSet)
      // TWO-LEVEL directory pruning: a filter on both levels keeps one
      // leaf's file(s) of 4 (d, source) combinations
      val q = spark.sql("SELECT k FROM graft_mp_t " +
        "WHERE d = '2024-01-02' AND source = 'api'")
      assert(q.count() == 5)
      val scan = graftScans(q).head
      assert(scan.chosenFiles.nonEmpty &&
        scan.chosenFiles.forall(_.startsWith("d=2024-01-02/source=api/")),
        s"two-level pruning failed: ${scan.chosenFiles}")
      // one level alone prunes too
      val q1 = spark.sql("SELECT k FROM graft_mp_t WHERE source = 'web'")
      assert(q1.count() == 10)
      assert(graftScans(q1).head.chosenFiles
        .forall(_.contains("/source=web/")))
      // zone maps still prune within the layout
      val someK = rows.head._1
      val qk = spark.sql(s"SELECT v FROM graft_mp_t WHERE k = $someK")
      assert(qk.count() >= 1)
      // _file provenance carries the full nested path
      val fs = spark.sql("SELECT DISTINCT _file FROM graft_mp_t").collect()
        .map(_.getString(0))
      assert(fs.forall(f => f.matches("d=[^/]+/source=[^/]+/.+\\.parquet")),
        s"bad _file shapes: ${fs.take(3).mkString(", ")}")
      // COW UPDATE preserves the nested layout
      spark.sql("UPDATE graft_mp_t SET v = 'redacted' " +
        "WHERE d = '2024-01-01' AND source = 'web'")
      val after = spark.sql(
        "SELECT v, d, source FROM graft_mp_t").collect()
      assert(after.count(r => r.getString(0) == "redacted") == 5)
      assert(new java.io.File(s"$root/d=2024-01-01/source=web")
        .listFiles().exists(_.getName.endsWith(".parquet")),
        "COW rewrite lost the nested layout")
      // round 18: the Scala rewrite verbs handle multi-level layouts too
      // (dedicated verb-by-verb coverage in MultiLevelVerbsSpec); here
      // just pin that a no-match delete no-ops instead of refusing
      assert(ManifestTable.deleteRows(
        spark, root, Seq(-1L).toDF("k"), "k").isEmpty)
      // SQL DELETE on a multi-level table takes the COW road and works
      spark.sql(s"DELETE FROM graft_mp_t WHERE v = 'redacted'")
      assert(spark.sql("SELECT count(*) FROM graft_mp_t").head.getLong(0)
        == 15L)
      // fsck reports nested-layout state; vacuum reclaims the superseded
      // nested files (round 17: the sweep walks partition dirs at any
      // depth — a first-level-only listing would strand them forever)
      assert(ManifestTable.fsck(spark, root).ok)
      assert(ManifestTable.vacuum(spark, root, keepVersions = 1) >= 1L,
        "vacuum must reclaim the superseded nested files (a first-level-" +
          "only sweep would strand them forever)")
      assert(ManifestTable.fsck(spark, root).orphanDataFiles.isEmpty)
      assert(spark.sql("SELECT count(*) FROM graft_mp_t").head.getLong(0)
        == 15L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_mp_t")
  }

  test("_file metadata column: provenance on both read shapes, hidden from SELECT *") {
    val root = tmpDir("graft_file_meta") + "/t"
    seed(root)
    // hidden unless selected
    assert(!fmt(root).columns.contains("_file"))
    // every row names the live file that serves it (columnar path)
    val got = fmt(root).select(col("k"), col("_file")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 100)
    val live = liveFiles(root)
    got.foreach { case (k, f) =>
      assert(live.contains(f), s"k=$k cites dead file $f")
      assert(f.startsWith(s"part=b${k / 100}/"), s"k=$k cites wrong file $f")
    }
    // the row path (a pending mask forces it) serves _file identically
    ManifestTable.deleteRowsDeferred(spark, root, Seq(3L).toDF("k"), "k")
    val masked = fmt(root).select(col("k"), col("_file")).collect()
    assert(masked.length == 99 &&
      masked.forall(r => live.contains(r.getString(1))))
    // _file-only select decodes no data page (constant-batch path): it
    // must still answer after physically removing a column's pages is
    // not provable here, but the count matches the footer law
    assert(fmt(root).select("_file").count() == 99L)
  }

  test("replaceFiles OCC: a concurrent commit between planning and publish aborts loudly; staged files fall to vacuum") {
    val root = tmpDir("graft_rlo_occ") + "/t"
    seed(root)
    val st = ManifestTable.currentVersion(spark, root)
    val lines = {
      // plan from the current snapshot
      val s0 = fmt(root) // force table resolution
      s0.count()
      (ManifestTable.readManifest(spark, root, st)._1,
        st)
    }
    // stage one replacement file by hand
    val stage = new java.io.File(tmpDir("graft_rlo_occ_stage"), "r.parquet")
    Seq((9999L, "x", "b0")).toDF("k", "s", "part")
      .coalesce(1).write.mode("overwrite").parquet(stage.getParent + "/w")
    val part = new java.io.File(stage.getParent + "/w").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val baseLines = ManifestTable.scanState(spark, root, Some(st)).lines
    val ex = intercept[java.util.ConcurrentModificationException] {
      ManifestTable.replaceFiles(spark, root, st, baseLines,
        removedRels = Seq(lines._1.head),
        staged = Seq(("part=b0", new org.apache.hadoop.fs.Path(part.toString))),
        beforePublish = () => {
          // a competing writer lands between derivation and publish
          ManifestTable.commit(spark, root,
            Seq((5000L, "w", "b9")).toDF("k", "s", "part"), "part",
            batchId = 99L)
          ()
        })
    }
    assert(ex.getMessage.contains("superseded snapshot"))
    // the loser's staged-live file is unreferenced debris for vacuum
    assert(ManifestTable.fsck(spark, root).ok)
  }
}
