package graft.sources

import graft.SparkSpec
import graft.core.ManifestTable
import org.apache.spark.sql.functions._

/** The persistent V2 TableCatalog (`spark.sql.catalog.<name> =
  * graft.sources.GraftCatalog`): the filesystem IS the metadata store —
  * tables and namespaces survive sessions with no re-declaration — and
  * the `system` procedures put OPTIMIZE/VACUUM/RESTORE/fsck behind SQL
  * CALL.
  */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse = tmpDir("graft_catalog_wh")

  private def register(name: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", warehouse)
  }

  test("catalog lifecycle: namespaces, CREATE/INSERT/SELECT, time travel, rename, drop — and persistence across catalog instances") {
    register("graft_c1")
    spark.sql("CREATE NAMESPACE graft_c1.ops")
    assert(spark.sql("SHOW NAMESPACES IN graft_c1").collect()
      .map(_.getString(0)).contains("ops"))
    spark.sql("CREATE TABLE graft_c1.ops.docs (k BIGINT, s STRING, " +
      "part STRING) USING `graft-manifest` " +
      "OPTIONS (statsColumns 'k') PARTITIONED BY (part)")
    assert(spark.sql("SHOW TABLES IN graft_c1.ops").collect()
      .map(_.getString(1)).contains("docs"))
    // declared, not committed: empty
    assert(spark.sql("SELECT * FROM graft_c1.ops.docs").isEmpty)
    spark.sql("INSERT INTO graft_c1.ops.docs VALUES " +
      "(1, 'a', 'b0'), (2, 'b', 'b0'), (103, 'c', 'b1')")
    spark.sql("INSERT INTO graft_c1.ops.docs VALUES (204, 'd', 'b2')")
    assert(spark.sql("SELECT count(*) FROM graft_c1.ops.docs")
      .head.getLong(0) == 4L)
    // declared zone maps registered: range filter answers correctly
    assert(spark.sql(
      "SELECT k FROM graft_c1.ops.docs WHERE k BETWEEN 100 AND 110")
      .collect().map(_.getLong(0)).toSeq == Seq(103L))
    // VERSION AS OF plans through the catalog
    assert(spark.sql("SELECT count(*) FROM graft_c1.ops.docs VERSION AS OF 0")
      .head.getLong(0) == 3L)
    // PERSISTENCE: a second catalog instance over the same root sees the
    // table purely from the filesystem (no session-local registry)
    register("graft_c2")
    assert(spark.sql("SELECT count(*) FROM graft_c2.ops.docs")
      .head.getLong(0) == 4L)
    // row-level SQL verbs work through the catalog identity
    spark.sql("DELETE FROM graft_c1.ops.docs WHERE k IN (2)")
    assert(spark.sql("SELECT count(*) FROM graft_c1.ops.docs")
      .head.getLong(0) == 3L)
    // rename + drop
    spark.sql("ALTER TABLE graft_c1.ops.docs RENAME TO ops.docs2")
    assert(spark.sql("SELECT count(*) FROM graft_c1.ops.docs2")
      .head.getLong(0) == 3L)
    intercept[Exception] { spark.sql("SELECT * FROM graft_c1.ops.docs") }
    // RETYPES refuse (additive-evolution contract; nullable ADD COLUMN,
    // RENAME and DROP are supported — round 19 column mapping, their
    // own specs)
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE graft_c1.ops.docs2 ALTER COLUMN s TYPE INT")
    }
    assert(ex.getMessage.contains("rewrite jobs") ||
      ex.getMessage.contains("not supported"), ex.getMessage)
    spark.sql("DROP TABLE graft_c1.ops.docs2")
    assert(spark.sql("SHOW TABLES IN graft_c1.ops").isEmpty)
    spark.sql("DROP NAMESPACE graft_c1.ops")
  }

  test("ALTER TABLE ADD COLUMN: additive evolution through DDL — old rows null-fill immediately, everything else refuses") {
    register("graft_c4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_c4.eva")
    spark.sql("CREATE TABLE graft_c4.eva.t (k BIGINT, part STRING) " +
      "USING `graft-manifest` PARTITIONED BY (part)")
    spark.sql("INSERT INTO graft_c4.eva.t VALUES (1, 'p0'), (2, 'p1')")
    spark.sql("ALTER TABLE graft_c4.eva.t ADD COLUMN z BIGINT")
    // the new column is readable IMMEDIATELY: old files null-fill
    val before = spark.sql("SELECT k, z FROM graft_c4.eva.t").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(before.toSet == Set((1L, None), (2L, None)))
    // new writes record it; old rows stay null (by-name insert: the
    // evolved table's positional order is recorded ++ extras ++ parts)
    spark.sql("INSERT INTO graft_c4.eva.t (k, part, z) VALUES (3, 'p0', 30)")
    val after = spark.sql("SELECT k, z FROM graft_c4.eva.t").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(after == Set((1L, None), (2L, None), (3L, Some(30L))))
    // the non-additive changes refuse loudly
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    // (DROP/RENAME moved to the supported set in round 19 — column
    // mapping, ColumnMappingSpec; retypes/repositions/NOT-NULL stay out)
    for (stmt <- Seq(
      "ALTER TABLE graft_c4.eva.t ALTER COLUMN z TYPE INT",
      "ALTER TABLE graft_c4.eva.t ALTER COLUMN z FIRST",
      "ALTER TABLE graft_c4.eva.t ADD COLUMN w BIGINT NOT NULL")) {
      val ex = intercept[Exception] { spark.sql(stmt) }
      assert(chain(ex).exists(m => m.contains("additive") ||
        m.contains("nullable") || m.contains("rewrite jobs") ||
        m.contains("not supported")), s"$stmt: ${chain(ex)}")
    }
    spark.sql("DROP TABLE graft_c4.eva.t")
  }

  test("CALL graft.system.{optimize, vacuum, fsck, restore}: the maintenance verbs behind SQL, stats as result rows") {
    register("graft_c3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_c3.maint")
    spark.sql("CREATE TABLE graft_c3.maint.t (k BIGINT, part STRING) " +
      "USING `graft-manifest` PARTITIONED BY (part)")
    // several small commits -> small files for optimize to fold
    for (b <- 0 until 3)
      spark.sql(s"INSERT INTO graft_c3.maint.t VALUES ($b, 'p0'), " +
        s"(${100 + b}, 'p1')")
    val opt = spark.sql(
      "CALL graft_c3.system.optimize(`table` => 'maint.t')").collect()
    assert(opt.nonEmpty && opt.forall(_.getInt(1) == 3),
      s"expected 3 input files per partition: ${opt.mkString(", ")}")
    assert(spark.sql("SELECT count(*) FROM graft_c3.maint.t")
      .head.getLong(0) == 6L)
    // fsck: clean table
    val fsck = spark.sql(
      "CALL graft_c3.system.fsck(`table` => 'maint.t')").head
    assert(fsck.getBoolean(2), s"fsck not ok: $fsck")
    // restore to the pre-optimize version (3 = last insert), then vacuum
    val rest = spark.sql(
      "CALL graft_c3.system.restore(`table` => 'maint.t', version => 2)")
      .head
    assert(rest.getLong(0) > 2L) // restore commits a NEW version
    assert(spark.sql("SELECT count(*) FROM graft_c3.maint.t")
      .head.getLong(0) == 6L)
    val vac = spark.sql(
      "CALL graft_c3.system.vacuum(`table` => 'maint.t', " +
        "keep_versions => 1)").head
    assert(vac.getLong(0) >= 1L,
      s"vacuum should reclaim the folded small files, deleted ${vac.getLong(0)}")
    assert(spark.sql("SELECT count(*) FROM graft_c3.maint.t")
      .head.getLong(0) == 6L)
    // unknown procedure refuses with the available list
    val ex = intercept[Exception] {
      spark.sql("CALL graft_c3.system.nonsense(`table` => 'maint.t')")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(m => m.contains("system.optimize") ||
      m.contains("FAILED_TO_LOAD_ROUTINE")), chain(ex).mkString(" | "))
    spark.sql("DROP TABLE graft_c3.maint.t")
  }

  test("CALL graft.system.history + TIMESTAMP AS OF: the audit surface behind SQL") {
    register("graft_c6")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_c6.hist")
    spark.sql("CREATE TABLE graft_c6.hist.t (k BIGINT, part STRING) " +
      "USING `graft-manifest` PARTITIONED BY (part)")
    spark.sql("INSERT INTO graft_c6.hist.t VALUES (1, 'p0'), (2, 'p1')")
    Thread.sleep(5)
    spark.sql("INSERT INTO graft_c6.hist.t VALUES (3, 'p0')")
    Thread.sleep(5)
    spark.sql("DELETE FROM graft_c6.hist.t WHERE k IN (1)")
    val h = spark.sql(
      "CALL graft_c6.system.history(`table` => 'hist.t')").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L))
    assert(h.map(_.getString(1)).toSeq == Seq("delete", "append", "append"),
      h.mkString(", "))
    assert(h.forall(!_.isNullAt(2)))
    // TIMESTAMP AS OF through the catalog: v1's publish time reads v1
    val t1 = h.find(_.getLong(0) == 1L).get.getLong(2)
    assert(spark.sql("SELECT count(*) FROM graft_c6.hist.t " +
      s"TIMESTAMP AS OF timestamp_millis(${t1}L)").head.getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM graft_c6.hist.t")
      .head.getLong(0) == 2L)
    spark.sql("DROP TABLE graft_c6.hist.t")
  }

  test("the full maintenance CALL surface: rewrite_partitions (plain + Z-order), build_bloom_index, drop_partitions, delete_deferred; ALTER TABLE SET registers zone maps post-creation") {
    register("graft_c7")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_c7.ops")
    spark.sql("CREATE TABLE graft_c7.ops.t (k BIGINT, x BIGINT, " +
      "part STRING) USING `graft-manifest` " +
      "OPTIONS (statsColumns 'k') PARTITIONED BY (part)")
    // 3 lineage batches
    for (b <- 0 until 3)
      spark.sql(s"INSERT INTO graft_c7.ops.t VALUES " +
        (0 until 4).map(i => s"(${100 * b + i}, ${1000 - 100 * b - i}, " +
          s"'b$b')").mkString(", "))
    def cnt(): Long = spark.sql(
      "SELECT count(*) FROM graft_c7.ops.t").head.getLong(0)
    assert(cnt() == 12L)
    // ALTER TABLE SET registers a SECOND zone-map column additively; the
    // non-additive spelling refuses
    spark.sql("ALTER TABLE graft_c7.ops.t " +
      "SET TBLPROPERTIES ('statsColumns' = 'k,x')")
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val exSet = intercept[Exception] {
      spark.sql("ALTER TABLE graft_c7.ops.t " +
        "SET TBLPROPERTIES ('statsColumns' = 'x')")
    }
    assert(chain(exSet).exists(_.contains("additively")), chain(exSet))
    // one more insert records x's stats under the extended registration
    spark.sql("INSERT INTO graft_c7.ops.t VALUES (999, 1, 'b3')")
    // bloom sidecar behind CALL
    val bi = spark.sql("CALL graft_c7.system.build_bloom_index(" +
      "`table` => 'ops.t', key_col => 'k')").head
    assert(bi.getInt(0) >= 4 && bi.getInt(2) == 0, bi.toString)
    // deferred mask behind CALL: applies immediately
    val dd = spark.sql("CALL graft_c7.system.delete_deferred(" +
      "`table` => 'ops.t', key_col => 'k', keys => '0,101')").head
    assert(dd.getLong(0) == 2L && dd.getLong(1) == 2L, dd.toString)
    assert(cnt() == 11L)
    spark.sql("CALL graft_c7.system.optimize(`table` => 'ops.t')") // purge
    assert(cnt() == 11L)
    // Z-order fold behind CALL: values unchanged (layout-only), one
    // folded first-level partition
    val rp = spark.sql("CALL graft_c7.system.rewrite_partitions(" +
      "`table` => 'ops.t', new_value => 'folded', " +
      "zorder_by => 'k,x')").head
    assert(rp.getString(0) == "part=folded", rp.toString)
    assert(cnt() == 11L)
    assert(spark.sql("SELECT DISTINCT part FROM graft_c7.ops.t").collect()
      .map(_.getString(0)).toSeq == Seq("folded"))
    // two-column zorder_by is required
    val exZ = intercept[Exception] {
      spark.sql("CALL graft_c7.system.rewrite_partitions(" +
        "`table` => 'ops.t', new_value => 'f2', zorder_by => 'k')")
    }
    assert(chain(exZ).exists(_.contains("exactly two")), chain(exZ))
    // scoped optimize behind CALL: the named prefix only (the fold left
    // one leaf, so scope it — a no-op fold returns zero rows, proving
    // the parameter reached the verb; an unmatched scope refuses)
    assert(spark.sql("CALL graft_c7.system.optimize(" +
      "`table` => 'ops.t', scope => 'part=folded')").collect().isEmpty)
    val exScope = intercept[Exception] {
      spark.sql("CALL graft_c7.system.optimize(" +
        "`table` => 'ops.t', scope => 'part=nope')").collect()
    }
    assert(chain(exScope).exists(_.contains("matches no live partition")),
      chain(exScope))
    // partition TTL behind CALL: drop the folded value -> empty table,
    // metadata-only (time travel intact)
    val dp = spark.sql("CALL graft_c7.system.drop_partitions(" +
      "`table` => 'ops.t', values => 'folded')").head
    assert(dp.getLong(0) >= 1L, dp.toString)
    assert(cnt() == 0L)
    val hist = spark.sql(
      "CALL graft_c7.system.history(`table` => 'ops.t')").collect()
    assert(hist.head.getString(1) == "drop-partitions",
      hist.map(_.getString(1)).mkString(", "))
    // RETENTION POLICY lives with the table: vacuum without an explicit
    // keep_versions refuses until the property is declared, then uses it
    def chain2(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain2(t.getCause)
    val exRet = intercept[Exception] {
      spark.sql("CALL graft_c7.system.vacuum(`table` => 'ops.t')")
    }
    assert(chain2(exRet).exists(_.contains("retention.keepVersions")),
      chain2(exRet))
    spark.sql("ALTER TABLE graft_c7.ops.t " +
      "SET TBLPROPERTIES ('retention.keepVersions' = '1')")
    val vacd = spark.sql(
      "CALL graft_c7.system.vacuum(`table` => 'ops.t')").head.getLong(0)
    assert(vacd >= 1L,
      s"policy-driven vacuum should reclaim the pre-TTL files: $vacd")
    assert(cnt() == 0L) // content unchanged by vacuum
    val exBad = intercept[Exception] {
      spark.sql("ALTER TABLE graft_c7.ops.t " +
        "SET TBLPROPERTIES ('retention.keepVersions' = 'zero')")
    }
    assert(chain2(exBad).exists(_.contains("positive integer")),
      chain2(exBad))
    spark.sql("DROP TABLE graft_c7.ops.t")
  }

  test("CALL graft.system.describe_detail: one-stop table metadata, zero data IO") {
    register("graft_c9")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_c9.dd")
    spark.sql("CREATE TABLE graft_c9.dd.t (k BIGINT, n BIGINT, " +
      "part STRING) USING `graft-manifest` OPTIONS (statsColumns 'k') " +
      "TBLPROPERTIES ('retention.keepVersions' = '4') " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO graft_c9.dd.t VALUES " +
      "(1, 10, 'p0'), (2, 20, 'p1'), (3, 30, 'p1')")
    spark.sql("ALTER TABLE graft_c9.dd.t RENAME COLUMN n TO m")
    val d = spark.sql(
      "CALL graft_c9.system.describe_detail(`table` => 'dd.t')").head
    assert(d.getAs[String]("format") == "graft-manifest")
    assert(d.getAs[Long]("version") == 0L)
    assert(d.getAs[Int]("num_files") == 2) // one per partition leaf
    assert(d.getAs[Long]("num_rows") == 3L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[String]("partition_spec") == "part")
    assert(d.getAs[String]("stats_columns").startsWith("k"))
    assert(d.getAs[String]("renamed_columns") == "m:n")
    assert(d.getAs[Int]("retention_keep_versions") == 4)
    assert(d.getAs[String]("last_operation") == "append") // INSERT INTO
    assert(d.getAs[Long]("last_commit_ts_ms") > 0L)
    // a hidden-layout table reports its transform spelling
    spark.sql("CREATE TABLE graft_c9.dd.ev (id BIGINT, ts TIMESTAMP) " +
      "USING `graft-manifest` PARTITIONED BY (days(ts), bucket(4, id))")
    val d2 = spark.sql(
      "CALL graft_c9.system.describe_detail(`table` => 'dd.ev')").head
    assert(d2.getAs[String]("partition_spec") == "days(ts), bucket(4,id)")
    assert(d2.getAs[Long]("version") == -1L) // declared, never committed
    assert(d2.getAs[Int]("num_files") == 0)
  }

  test("descriptor resilience: writes publish via tmp+rename (no tmp debris), and a corrupt descriptor on a committed table falls back to manifest-authoritative loading") {
    register("graft_c5")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_c5.res")
    spark.sql("CREATE TABLE graft_c5.res.t (k BIGINT, part STRING) " +
      "USING `graft-manifest` PARTITIONED BY (part)")
    spark.sql("INSERT INTO graft_c5.res.t VALUES (1, 'p0'), (2, 'p1')")
    val dir = new org.apache.hadoop.fs.Path(s"$warehouse/res/t")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ALTER rewrites the descriptor — afterwards no tmp file may remain
    spark.sql("ALTER TABLE graft_c5.res.t ADD COLUMN extra STRING")
    assert(!fs.listStatus(dir).exists(_.getPath.getName.contains(".tmp-")),
      "descriptor publish left tmp debris behind")
    assert(spark.sql("SELECT * FROM graft_c5.res.t").columns
      .contains("extra"))
    // simulate a crash mid-rewrite: truncate the descriptor in place
    val desc = new org.apache.hadoop.fs.Path(dir, "_graft-table.json")
    val out = fs.create(desc, true)
    out.write("{\"schemaB64\":\"tr".getBytes("UTF-8")); out.close()
    // the committed table still loads (manifest-authoritative fallback);
    // the declared-only 'extra' column is gone with the descriptor
    val cols = spark.sql("SELECT * FROM graft_c5.res.t").columns.toSeq
    assert(cols.contains("k") && cols.contains("part"), cols.toString)
    assert(spark.sql("SELECT count(*) FROM graft_c5.res.t")
      .head.getLong(0) == 2L)
    // ALTER self-heals: rewrites a fresh descriptor from the manifest
    spark.sql("ALTER TABLE graft_c5.res.t ADD COLUMN extra2 STRING")
    assert(spark.sql("SELECT * FROM graft_c5.res.t").columns
      .contains("extra2"))
    // a corrupt descriptor on a DECLARED-ONLY table refuses loudly
    spark.sql("CREATE TABLE graft_c5.res.u (k BIGINT, part STRING) " +
      "USING `graft-manifest` PARTITIONED BY (part)")
    val udesc = new org.apache.hadoop.fs.Path(
      s"$warehouse/res/u/_graft-table.json")
    val out2 = fs.create(udesc, true)
    out2.write("garbage".getBytes("UTF-8")); out2.close()
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft_c5.res.u").collect()
    }
    assert(chain(ex).exists(m => m.contains("corrupt") ||
      m.contains("TABLE_OR_VIEW_NOT_FOUND")), chain(ex).mkString(" | "))
    spark.sql("DROP TABLE graft_c5.res.t")
    fs.delete(new org.apache.hadoop.fs.Path(s"$warehouse/res/u"), true)
  }
}
