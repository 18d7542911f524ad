package graft.sources

import graft.SparkSpec
import graft.core.ManifestTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DSv2 `graft-manifest` read path must be VALUE- AND TYPE-IDENTICAL
  * to the Scala API ([[ManifestTable.read]]/readVersion) on every table
  * shape the format writes — and its pushdown must provably skip files
  * (zone maps, bloom sidecar, partition values) while Spark re-applies
  * every filter row-level (the PushedFilters contract). The raw
  * `spark.read.parquet(root)` bypass is documented-refused via the
  * sentinel.
  */
class GraftManifestSourceSpec extends SparkSpec {

  import spark.implicits._

  private def fmt(root: String): DataFrame =
    spark.read.format("graft-manifest").load(root)

  private def sameFrame(a: DataFrame, b: DataFrame, clue: String): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) ==
      b.schema.map(f => (f.name, f.dataType)),
      s"$clue: schema diverged — ${a.schema.simpleString} vs ${b.schema.simpleString}")
    val cols = a.columns.sorted.map(col).toSeq
    assert(a.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
      b.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty,
      s"$clue: values diverged")
  }

  private def graftScans(df: DataFrame): Seq[GraftManifestScan] = {
    // recurse through AQE wrappers and query stages (both are leaf-like
    // to the plain collect)
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

  test("format read ≡ ManifestTable.read on int-bucketed and string-lineage tables; versionAsOf time-travels") {
    // int-partitioned (bucket=0..3)
    val r1 = tmpDir("graft_dsv2_int") + "/t"
    ManifestTable.commit(spark, r1,
      (0 until 40).map(i => (i.toLong, 10L * i, s"s$i"))
        .toDF("k", "v", "s")
        .withColumn("bucket", pmod(col("k"), lit(4)).cast("int")),
      "bucket", batchId = 0L)
    sameFrame(fmt(r1), ManifestTable.read(spark, r1).get, "int buckets")
    // string-lineage (part=b0, b1) + a second version
    val r2 = tmpDir("graft_dsv2_str") + "/t"
    for (b <- 0 until 2)
      ManifestTable.commit(spark, r2,
        (0 until 10).map(i => (100L * b + i, s"b$b")).toDF("k", "part"),
        "part", batchId = b.toLong, statsCol = Some("k"))
    sameFrame(fmt(r2), ManifestTable.read(spark, r2).get, "string lineage")
    // time travel
    sameFrame(
      spark.read.format("graft-manifest").option("versionAsOf", "0").load(r2),
      ManifestTable.readVersion(spark, r2, 0L), "versionAsOf 0")
    // count(*) drives off footer counts (no data columns needed)
    assert(fmt(r2).count() == 20L)
  }

  test("zone-map pushdown skips files; values equal the unpruned filter") {
    val root = tmpDir("graft_dsv2_zone") + "/t"
    // four near-disjoint k-ranges, one file each (the st18 shape)
    for (b <- 0 until 4)
      ManifestTable.commit(spark, root,
        (0 until 10).map(i => (100L * b + i, s"b$b")).toDF("k", "part")
          .repartition(1), "part", batchId = b.toLong,
        statsCol = Some("k"))
    val q = fmt(root).filter(col("k") >= 105L && col("k") <= 108L)
    val rows = q.select("k").collect().map(_.getLong(0)).toSet
    assert(rows == (105L to 108L).toSet, s"got $rows")
    val scan = graftScans(q).head
    assert(scan.totalFiles == 4 && scan.chosenFiles.size == 1,
      s"zone pushdown failed: ${scan.chosenFiles.size}/${scan.totalFiles}")
    assert(scan.description().contains("prunedFiles=1/4"),
      s"explain surface missing the pruning: ${scan.description()}")
    // partition-value pruning
    val qp = fmt(root).filter(col("part") === "b2")
    assert(qp.count() == 10L)
    assert(graftScans(qp).head.chosenFiles == Seq(s"part=b2/" +
      graftScans(qp).head.chosenFiles.head.split('/')(1)))
    // a contradictory range is provably empty: zero files planned
    val qe = fmt(root).filter(col("k") > 50L && col("k") < 40L)
    assert(qe.isEmpty && graftScans(qe).head.chosenFiles.isEmpty)
    // a null element in an IN list must not crash the pushdown (null
    // never matches; the non-null subset still prunes)
    val qn = fmt(root).filter(col("part").isin("b2", null))
    assert(qn.count() == 10L)
    val qkn = fmt(root).filter(col("k").isin(105L, null))
    assert(qkn.select("k").collect().map(_.getLong(0)).toSeq == Seq(105L))
  }

  test("bloom pushdown narrows past the zone envelope on equality keys") {
    val root = tmpDir("graft_dsv2_bloom") + "/t"
    // keys interleaved so every file's [min, max] spans the whole space —
    // zone maps keep everything, only the bloom sidecar can narrow
    for (b <- 0 until 4)
      ManifestTable.commit(spark, root,
        (0 until 50).map(i => (i * 4L + b, s"b$b")).toDF("k", "part")
          .repartition(1), "part", batchId = b.toLong,
        statsCol = Some("k"))
    ManifestTable.buildBloomIndex(spark, root, "k")
    val q = fmt(root).filter(col("k") === 42L) // lives in b2 only
    assert(q.select("part").collect().map(_.getString(0)).toSeq == Seq("b2"))
    val scan = graftScans(q).head
    assert(scan.chosenFiles.size < scan.totalFiles,
      s"bloom probe did not narrow: ${scan.chosenFiles.size}/${scan.totalFiles}")
    assert(scan.chosenFiles.forall(_.startsWith("part=b2/")),
      s"bloom kept the wrong files: ${scan.chosenFiles}")
  }

  test("the U18 deletion-vector mask applies inside the scan — current and time-travel reads") {
    val root = tmpDir("graft_dsv2_dv") + "/t"
    ManifestTable.commit(spark, root,
      (0 until 30).map(i => (i.toLong, s"s$i", i % 3))
        .toDF("k", "s", "bucket"), "bucket", batchId = 0L)
    // batch 1 lands in NEW buckets — commit REPLACES touched partitions,
    // so an append must target fresh partition values
    ManifestTable.commit(spark, root,
      (30 until 40).map(i => (i.toLong, s"s$i", i % 3 + 3))
        .toDF("k", "s", "bucket"), "bucket", batchId = 1L)
    ManifestTable.deleteRowsDeferred(spark, root,
      Seq(7L, 23L, 35L).toDF("k"), "k")
    sameFrame(fmt(root), ManifestTable.read(spark, root).get,
      "masked current read")
    assert(fmt(root).filter(col("k").isin(7L, 23L, 35L)).isEmpty,
      "a masked key leaked through the DSv2 scan")
    // the mask applies to time travel WHILE pending (U18's contract)
    sameFrame(
      spark.read.format("graft-manifest").option("versionAsOf", "0").load(root),
      ManifestTable.readVersion(spark, root, 0L), "masked time travel")
    // purge, then the physical state reads identically with no mask
    ManifestTable.optimize(spark, root)
    sameFrame(fmt(root), ManifestTable.read(spark, root).get, "post-purge")
    assert(fmt(root).count() == 37L)
  }

  test("additive schema evolution: old files null-fill through the DSv2 reader") {
    val root = tmpDir("graft_dsv2_evo") + "/t"
    ManifestTable.commit(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s")
        .withColumn("part", lit("b0")), "part", batchId = 0L)
    ManifestTable.commit(spark, root,
      Seq((3L, "c", 33L)).toDF("k", "s", "extra")
        .withColumn("part", lit("b1")), "part", batchId = 1L)
    sameFrame(fmt(root), ManifestTable.read(spark, root).get, "evolved")
    val got = fmt(root).select("k", "extra").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == Set((1L, -1L), (2L, -1L), (3L, 33L)), s"got $got")
    // widening: a narrow int file under the long-recorded column — the
    // recorded schema is already long here; pin the int32 read leg via a
    // fresh table whose first commit is int and second is long
    val r2 = tmpDir("graft_dsv2_widen") + "/t"
    ManifestTable.commit(spark, r2,
      Seq((1, "b0")).toDF("n", "part"), "part", batchId = 0L)
    ManifestTable.commit(spark, r2,
      Seq((2L, "b1")).toDF("n", "part"), "part", batchId = 1L)
    val ns = fmt(r2).select("n").collect().map(_.getLong(0)).toSet
    assert(ns == Set(1L, 2L), s"widened read diverged: $ns")
  }

  test("SQL DDL surface: a view registered USING graft-manifest answers SQL with the same plan guarantees") {
    val root = tmpDir("graft_dsv2_sql") + "/t"
    for (b <- 0 until 4)
      ManifestTable.commit(spark, root,
        (0 until 10).map(i => (100L * b + i, s"b$b")).toDF("k", "part")
          .repartition(1), "part", batchId = b.toLong,
        statsCol = Some("k"))
    ManifestTable.deleteRowsDeferred(spark, root, Seq(102L).toDF("k"), "k")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_sql_t " +
      s"USING `graft-manifest` OPTIONS (path '$root')")
    // values: masked snapshot, SQL-addressable
    assert(spark.sql("SELECT count(*) FROM graft_sql_t").head.getLong(0)
      == 39L, "the SQL view bypassed the deferred-delete mask")
    // pushdown flows through the SQL path too
    val q = spark.sql(
      "SELECT k FROM graft_sql_t WHERE k BETWEEN 205 AND 208")
    assert(q.collect().map(_.getLong(0)).toSet == (205L to 208L).toSet)
    val scan = graftScans(q).head
    assert(scan.chosenFiles.size == 1 && scan.totalFiles == 4,
      s"SQL-path pushdown failed: ${scan.chosenFiles.size}/${scan.totalFiles}")
    spark.catalog.dropTempView("graft_sql_t")
  }

  test("DSv2 write: append lands through the manifest (fence, zone maps, OCC), overwrite truncates") {
    import org.apache.spark.sql.SaveMode
    val root = tmpDir("graft_dsv2_write") + "/t"
    // creation stays with the Scala API (partitioning + registration are
    // creation-time decisions); writes refuse on an uncommitted root
    intercept[Exception] {
      Seq((1L, "b0")).toDF("k", "part").write.format("graft-manifest")
        .mode(SaveMode.Append).save(root)
    }
    ManifestTable.commit(spark, root,
      (0 until 10).map(i => (i.toLong, "b0")).toDF("k", "part"),
      "part", batchId = 0L, statsCol = Some("k"))
    // APPEND through the format: new partition, fence advances, zone
    // maps recorded from the new footers
    (100 until 110).map(i => (i.toLong, "b1")).toDF("k", "part")
      .repartition(1)
      .write.format("graft-manifest").mode(SaveMode.Append)
      .option("batchId", "1").option("statsColumns", "k")
      .save(root)
    assert(ManifestTable.read(spark, root).get.count() == 20L)
    assert(ManifestTable.lastBatch(spark, root) == 1L)
    val (pruned, total) = ManifestTable.prunedFiles(spark, root, "k", 100L, 105L)
    assert(pruned.size < total,
      s"the written files carry no zone maps: $pruned of $total")
    // the fence: a REDELIVERED batch id no-ops (exactly-once writers)
    (500 until 510).map(i => (i.toLong, "b9")).toDF("k", "part")
      .write.format("graft-manifest").mode(SaveMode.Append)
      .option("batchId", "1").save(root)
    assert(ManifestTable.read(spark, root).get.count() == 20L,
      "a redelivered write batch re-applied")
    // round-trip: format write → format read ≡ the input
    val got = fmt(root).select("k").collect().map(_.getLong(0)).toSet
    assert(got == ((0 until 10) ++ (100 until 110)).map(_.toLong).toSet)
    // append to an EXISTING partition adds files, never replaces
    (10 until 15).map(i => (i.toLong, "b0")).toDF("k", "part")
      .write.format("graft-manifest").mode(SaveMode.Append)
      .option("batchId", "2").save(root)
    assert(fmt(root).filter(col("part") === "b0").count() == 15L,
      "an append replaced the partition's existing rows")
    // OVERWRITE = truncate: the table becomes exactly the written frame
    (0 until 7).map(i => (1000L + i, "fresh")).toDF("k", "part")
      .write.format("graft-manifest").mode(SaveMode.Overwrite)
      .option("batchId", "3").save(root)
    assert(fmt(root).count() == 7L)
    assert(fmt(root).select("part").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("fresh"))
    // pre-overwrite snapshots still time-travel until vacuum
    assert(ManifestTable.readVersion(spark, root,
      ManifestTable.currentVersion(spark, root) - 1).count() == 25L)
    assert(ManifestTable.fsck(spark, root).ok)
    // null partition values refuse loudly
    intercept[Exception] {
      Seq((1L, null.asInstanceOf[String])).toDF("k", "part")
        .write.format("graft-manifest").mode(SaveMode.Append)
        .option("batchId", "9").save(root)
    }
  }

  test("date-partitioned tables read type-identically to the Scala path; unsupported inferred shapes refuse") {
    val root = tmpDir("graft_dsv2_date") + "/t"
    ManifestTable.commit(spark, root,
      (0 until 12).map(i => (i.toLong, java.sql.Date.valueOf(
        f"2024-01-${i % 3 + 1}%02d"))).toDF("k", "d"),
      "d", batchId = 0L)
    // the Scala path infers DateType via basePath — the DSv2 schema must
    // match it exactly (ADVICE, round 15: it said string here before)
    sameFrame(fmt(root), ManifestTable.read(spark, root).get, "date parts")
    // date-equality partition pruning
    val q = fmt(root).filter(col("d") === lit(java.sql.Date.valueOf("2024-01-02")))
    assert(q.count() == 4L)
    val scan = graftScans(q).head
    assert(scan.chosenFiles.nonEmpty &&
      scan.chosenFiles.forall(_.startsWith("d=2024-01-02/")),
      s"date partition pruning failed: ${scan.chosenFiles}")
    // inference unit pins: the per-shape law and the loud refusals
    assert(GraftManifestSource.inferPartitionType(Seq("1", "2")) ==
      org.apache.spark.sql.types.IntegerType)
    assert(GraftManifestSource.inferPartitionType(Seq("1", "9999999999")) ==
      org.apache.spark.sql.types.LongType)
    assert(GraftManifestSource.inferPartitionType(Seq("2024-01-01")) ==
      org.apache.spark.sql.types.DateType)
    assert(GraftManifestSource.inferPartitionType(Seq("2024-01-01", "x")) ==
      org.apache.spark.sql.types.StringType,
      "any string-typed value resolves the column to string (Spark parity)")
    for (bad <- Seq(Seq("1.5"), Seq("2024-01-01 12%3A00%3A00"),
        Seq("99999999999999999999999999999999999999"),
        // Double.parseDouble trims where Integer.parseInt does not, so
        // Spark infers ' 1' as DOUBLE — we must refuse it, not string it
        Seq(" 1"))) {
      val ex = intercept[IllegalArgumentException] {
        GraftManifestSource.inferPartitionType(bad)
      }
      assert(ex.getMessage.contains("ManifestTable.read"), s"$bad: $ex")
    }
  }

  test("plan-time file sizing comes from manifest line meta: zero status probes on fresh tables, fallback on legacy lines") {
    val root = tmpDir("graft_dsv2_meta") + "/t"
    for (b <- 0 until 3)
      ManifestTable.commit(spark, root,
        (0 until 10).map(i => (10L * b + i, s"b$b")).toDF("k", "part")
          .repartition(1), "part", batchId = b.toLong, statsCol = Some("k"))
    val q = fmt(root)
    val scan = graftScans(q).head
    assert(scan.chosenFiles.size == 3)
    assert(scan.planStatProbes == 0,
      s"a fresh table's scan must plan from manifest meta alone, " +
        s"probed ${scan.planStatProbes} files")
    // the row-count estimate is exact from the meta
    assert(scan.estimateStatistics().numRows().getAsLong == 30L)
    // LEGACY manifest (pre-meta): strip the %# fields from the live
    // manifest — the scan must fall back to status probes and still
    // answer identically, with an empty row estimate
    val mPath = new java.io.File(s"$root/_manifest")
    val latest = mPath.listFiles().filter(_.getName.matches("v\\d+\\.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".json").toInt)
    val txt = scala.io.Source.fromFile(latest)
    val body = try txt.mkString finally txt.close()
    val stripped = body.linesIterator.map(
      _.replaceAll("\\|%#\\d+:\\d+", "")).mkString("\n")
    val w = new java.io.PrintWriter(latest); try w.print(stripped) finally w.close()
    val q2 = fmt(root)
    val scan2 = graftScans(q2).head
    assert(scan2.planStatProbes == 3, "legacy lines must probe")
    assert(!scan2.estimateStatistics().numRows().isPresent)
    assert(q2.select("k").collect().map(_.getLong(0)).toSet ==
      (0 until 3).flatMap(b => (0 until 10).map(i => 10L * b + i)).toSet)
    // zone pruning still works on legacy lines
    val q3 = fmt(root).filter(col("k") >= 10L && col("k") <= 12L)
    assert(graftScans(q3).head.chosenFiles.size == 1)
  }

  test("fsck validates recorded file meta (bytes and rows) against the physical files") {
    val root = tmpDir("graft_dsv2_fsckmeta") + "/t"
    ManifestTable.commit(spark, root,
      (0 until 10).map(i => (i.toLong, "b0")).toDF("k", "part"),
      "part", batchId = 0L, statsCol = Some("k"))
    assert(ManifestTable.fsck(spark, root).statViolations.isEmpty)
    // corrupt the recorded byte length in the manifest
    val mPath = new java.io.File(s"$root/_manifest/v0.json")
    val txt = scala.io.Source.fromFile(mPath)
    val body = try txt.mkString finally txt.close()
    val w = new java.io.PrintWriter(mPath)
    try w.print(body.replaceFirst("\\|%#\\d+:", "|%#1:")) finally w.close()
    val rep = ManifestTable.fsck(spark, root)
    assert(rep.statViolations.exists(_.endsWith("[%#bytes]")),
      s"fsck missed the drifted byte length: ${rep.statViolations}")
  }

  test("a write through a time-traveled handle refuses") {
    import org.apache.spark.sql.SaveMode
    val root = tmpDir("graft_dsv2_ttw") + "/t"
    ManifestTable.commit(spark, root,
      Seq((1L, "b0")).toDF("k", "part"), "part", batchId = 0L)
    ManifestTable.commit(spark, root,
      Seq((2L, "b1")).toDF("k", "part"), "part", batchId = 1L)
    val ex = intercept[Exception] {
      Seq((3L, "b2")).toDF("k", "part").write.format("graft-manifest")
        .option("versionAsOf", "0").mode(SaveMode.Append).save(root)
    }
    assert(ex.getMessage.contains("time-traveled"),
      s"expected the time-travel write refusal, got: ${ex.getMessage}")
  }

  test("a pending mask above keyBroadcastLimit: the DSv2 scan refuses with the purge instruction; the Scala read shuffles") {
    val root = tmpDir("graft_dsv2_dvbig") + "/t"
    ManifestTable.commit(spark, root,
      (0 until 30).map(i => (i.toLong, i % 3)).toDF("k", "bucket"),
      "bucket", batchId = 0L)
    ManifestTable.deleteRowsDeferred(spark, root,
      Seq(4L, 11L, 25L).toDF("k"), "k")
    val expect = (0L until 30L).toSet -- Set(4L, 11L, 25L)
    spark.conf.set("spark.graft.manifest.keyBroadcastLimit", "0")
    try {
      // the in-reader mask cannot ship an over-limit key set — refuse
      val ex = intercept[Exception] { fmt(root).collect() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(ex).exists(m => m.contains("keyBroadcastLimit") &&
        m.contains("optimize")), s"wrong refusal: ${chain(ex)}")
      // the Scala path masks the same keys through the SHUFFLE twin,
      // value-identical to the broadcast one
      assert(ManifestTable.read(spark, root).get
        .select("k").collect().map(_.getLong(0)).toSet == expect)
    } finally spark.conf.unset("spark.graft.manifest.keyBroadcastLimit")
    // back under the limit both paths answer identically
    assert(fmt(root).select("k").collect().map(_.getLong(0)).toSet == expect)
  }

  test("SQL DDL creation: CREATE TABLE ... USING graft-manifest, INSERT INTO, SELECT — the whole lifecycle in SQL") {
    val root = tmpDir("graft_dsv2_ddl") + "/t"
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    spark.sql(
      "CREATE TABLE graft_ddl_t (k BIGINT, s STRING, part STRING) " +
        "USING `graft-manifest` " +
        s"OPTIONS (path '$root', partitionCol 'part', statsColumns 'k')")
    try {
      // declared, not yet committed: SELECT answers empty
      assert(spark.sql("SELECT * FROM graft_ddl_t").isEmpty)
      // first INSERT creates version 0 with the declared partitioning
      spark.sql("INSERT INTO graft_ddl_t VALUES " +
        "(1, 'a', 'b0'), (2, 'b', 'b0'), (103, 'c', 'b1')")
      assert(spark.sql("SELECT count(*) FROM graft_ddl_t").head.getLong(0) == 3L)
      assert(ManifestTable.currentVersion(spark, root) == 0L)
      // the declared zone-map registration landed: a range filter prunes
      spark.sql("INSERT INTO graft_ddl_t VALUES (204, 'd', 'b2')")
      val q = spark.sql("SELECT k FROM graft_ddl_t WHERE k >= 100 AND k <= 110")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(103L))
      val scan = graftScans(q).head
      assert(scan.chosenFiles.size < scan.totalFiles,
        s"declared statsColumns did not register zone maps: " +
          s"${scan.chosenFiles.size}/${scan.totalFiles}")
      // the created table is a plain manifest table: the Scala API and
      // the maintenance verbs see it identically
      assert(ManifestTable.read(spark, root).get.count() == 4L)
      // partition-column round trip through the SQL path
      assert(spark.sql("SELECT DISTINCT part FROM graft_ddl_t ORDER BY part")
        .collect().map(_.getString(0)).toSeq == Seq("b0", "b1", "b2"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
  }

  test("SQL DDL creation with a hidden transform: PARTITIONED BY (bucket(8, k)) via the session catalog derives the layout (ADVICE r19)") {
    // the bare-provider road used to collect only identity transforms,
    // silently creating an UNPARTITIONED table whose first INSERT failed
    // with a misleading "no declared partition column(s)". bucket() is
    // the one non-identity transform Spark's session catalog passes
    // through to a provider (days() etc refuse loudly at CREATE inside
    // Spark itself — the catalog road serves those).
    val root = tmpDir("graft_dsv2_ddl_bucket") + "/t"
    spark.sql("DROP TABLE IF EXISTS graft_ddl_bucket")
    spark.sql(
      "CREATE TABLE graft_ddl_bucket (k BIGINT, s STRING) " +
        "USING `graft-manifest` PARTITIONED BY (bucket(8, k)) " +
        s"OPTIONS (path '$root')")
    try {
      spark.sql("INSERT INTO graft_ddl_bucket VALUES " +
        "(1, 'a'), (2, 'b'), (3, 'c'), (17, 'd')")
      // the derived level landed as k_bucket=<n> directories, hashed by
      // the engine's own derivation
      val leaves = new java.io.File(root).listFiles()
        .filter(_.isDirectory).map(_.getName)
        .filter(_.startsWith("k_bucket=")).sorted.toSeq
      val expect = Seq(1L, 2L, 3L, 17L)
        .map(v => s"k_bucket=${PartitionTransforms.bucketOfLong(v, 8)}")
        .distinct.sorted
      assert(leaves == expect, s"$leaves vs $expect")
      // an equality predicate on the SOURCE column opens only its bucket
      val q = spark.sql("SELECT s FROM graft_ddl_bucket WHERE k = 17")
      assert(q.collect().map(_.getString(0)).toSeq == Seq("d"))
      val scan = graftScans(q).head
      val b17 = PartitionTransforms.bucketOfLong(17L, 8)
      assert(scan.chosenFiles.forall(_.startsWith(s"k_bucket=$b17/")),
        scan.chosenFiles.toString)
      assert(scan.chosenFiles.size < scan.totalFiles)
    } finally spark.sql("DROP TABLE IF EXISTS graft_ddl_bucket")
  }

  test("DSv2 write: a high-cardinality partition column clusters+sorts into ONE file per leaf (round 18), rows exact") {
    import org.apache.spark.sql.SaveMode
    val root = tmpDir("graft_dsv2_cap") + "/t"
    ManifestTable.commit(spark, root,
      Seq((-1L, "seed")).toDF("k", "part"), "part", batchId = 0L)
    // 200 rows round-robining 40 partition values under a 4-writer cap:
    // before round 18 the unsorted stream thrashed the LRU into one file
    // per few rows (the sf1 u28 anchor hit 50k files for 50k rows); the
    // write now REQUESTS a clustered+sorted distribution, so each leaf
    // is visited contiguously and the cap never evicts a live writer
    val rows = (0 until 200).map(i => (i.toLong, s"p${i % 40}"))
    rows.toDF("k", "part").repartition(1)
      .write.format("graft-manifest").mode(SaveMode.Append)
      .option("maxOpenWriters", "4").save(root)
    val got = fmt(root).filter(col("k") >= 0).select("k", "part").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == rows.toSet, "rows lost or duplicated under the writer cap")
    val lines = spark.read.format("graft-manifest").load(root)
      .queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[GraftManifestScan] =>
          b.scan.asInstanceOf[GraftManifestScan].totalFiles
      }.head
    assert(lines == 41,
      s"clustered+sorted write must land one file per leaf (+1 seed): $lines")
  }

  test("writer LRU cap: an UNSORTED stream (the streaming sink's shape) still round-trips exactly under eviction") {
    // the eviction road stays live for writers Spark does not sort (the
    // native streaming sink) — drive GraftDataWriter directly with rows
    // interleaved across more leaves than the cap and prove no row is
    // lost and revisits open fresh files
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val stage = tmpDir("graft_writer_lru") + "/stage"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("part",
        org.apache.spark.sql.types.StringType)))
    val w = new GraftDataWriter(stage, schema, Seq(IdentitySpec("part")),
      partitionId = 0, taskId = 0L,
      confProps = GraftManifestSource.confProps(spark), maxOpenWriters = 2)
    val rows = (0 until 60).map(i => (i.toLong, s"p${i % 6}"))
    rows.foreach { case (k, p) =>
      w.write(InternalRow(k, UTF8String.fromString(p)))
    }
    val msg = w.commit().asInstanceOf[GraftCommitMessage]
    assert(msg.files.length > 6,
      s"cap 2 over 6 interleaved leaves must evict+reopen: ${msg.files.length}")
    val back = spark.read.parquet(
      msg.files.map(_._2).distinct: _*).collect()
      .map(r => (r.getLong(0))).toSet
    assert(back == rows.map(_._1).toSet, "eviction lost or duplicated rows")
  }

  test("aggregate pushdown: COUNT/MIN/MAX answer from the manifest alone — zero file IO, with honest refusals") {
    val root = tmpDir("graft_dsv2_agg") + "/t"
    for (b <- 0 until 3)
      ManifestTable.commit(spark, root,
        (0 until 10).map(i => (100L * b + i, s"s$i", s"b$b"))
          .toDF("k", "s", "part").repartition(1),
        "part", batchId = b.toLong, statsCol = Some("k"))
    def aggScans(df: DataFrame): Seq[GraftAggScan] =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[GraftAggScan] =>
          b.scan.asInstanceOf[GraftAggScan]
      }
    val q = fmt(root).agg(count(lit(1)).as("n"),
      min(col("k")).as("mn"), max(col("k")).as("mx"))
    assert(aggScans(q).nonEmpty, "aggregate did not push to the manifest")
    val r = q.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((30L, 0L, 209L)))
    // ZERO FILE IO, proven: physically remove a data file — the pushed
    // aggregate still answers (the manifest is the aggregate), while a
    // row-fetching query over the same table fails
    val victim = new java.io.File(s"$root/part=b1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val stash = java.nio.file.Files.readAllBytes(victim.toPath)
    victim.delete()
    try {
      val r2 = fmt(root).agg(count(lit(1)), min(col("k")), max(col("k"))).head
      assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == ((30L, 0L, 209L)),
        "the pushed aggregate should never open a data file")
      intercept[Exception] { fmt(root).select("k").collect() }
    } finally java.nio.file.Files.write(victim.toPath, stash)
    // refusals fall back to the exact scan path:
    // (a) a filter present (file pruning is a superset — never aggregate)
    val qf = fmt(root).filter(col("k") >= 100L)
      .agg(count(lit(1)).as("n"))
    assert(aggScans(qf).isEmpty && qf.head.getLong(0) == 20L)
    // (b) a string column never serves MIN/MAX (binary footer stats may
    // be truncation-adjusted bounds, not values)
    val qs = fmt(root).agg(min(col("s")))
    assert(aggScans(qs).isEmpty && qs.head.getString(0) == "s0")
    // (c) a pending deletion mask makes manifest counts stale — refuse
    ManifestTable.deleteRowsDeferred(spark, root, Seq(5L).toDF("k"), "k")
    val qm = fmt(root).agg(count(lit(1)).as("n"))
    assert(aggScans(qm).isEmpty && qm.head.getLong(0) == 29L,
      "a masked table must aggregate through the scan, not the manifest")
  }

  test("runtime filtering: a broadcast join's observed keys prune fact files at execution time") {
    val root = tmpDir("graft_dsv2_dpp") + "/t"
    // 8 partitions, near-disjoint k ranges, one file each
    for (b <- 0 until 8)
      ManifestTable.commit(spark, root,
        (0 until 10).map(i => (100L * b + i, s"b$b")).toDF("k", "part")
          .repartition(1), "part", batchId = b.toLong, statsCol = Some("k"))
    // DPP requires a SELECTIVE predicate on the build side (an
    // unfiltered dimension would prune nothing by definition) — and the
    // dimension must be FILE-backed: a filter over a LocalRelation
    // constant-folds away before the pruning rule sees it
    val dimDir = tmpDir("graft_dsv2_dpp_dim")
    Seq(("b2", "x"), ("b5", "y"), ("b0", "skip"), ("b1", "skip"))
      .toDF("part", "label").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("label").isin("x", "y"))
    val fact = fmt(root)
    val joined = fact.join(broadcast(dim), Seq("part")).select("k", "label")
    val rows = joined.collect()
    assert(rows.length == 20 &&
      rows.forall(r => (200L to 209L).contains(r.getLong(0)) ||
        (500L to 509L).contains(r.getLong(0))))
    val scan = graftScans(joined).head
    scan.runtimeNarrowed match {
      case Some((narrowed, from)) =>
        assert(narrowed == 2 && from == 8,
          s"runtime filter kept $narrowed/$from — expected 2/8")
      case None =>
        fail("no runtime filter reached the scan (DPP not planned?); " +
          s"plan:\n${joined.queryExecution.executedPlan}")
    }
    // a runtime filter on the zone-mapped key column narrows too
    val dimKDir = tmpDir("graft_dsv2_dpp_dimk")
    ((200L to 203L).map(k => (k, "z")) ++ Seq((900L, "w")))
      .toDF("k", "label").write.mode("overwrite").parquet(dimKDir)
    val dimK = spark.read.parquet(dimKDir).filter(col("label") === "z")
    val joinedK = fact.join(broadcast(dimK), Seq("k"))
    assert(joinedK.count() == 4L)
    graftScans(joinedK).head.runtimeNarrowed.foreach { case (n, f) =>
      assert(n <= 1 && f == 8, s"zone runtime filter kept $n/$f")
    }
  }

  test("columnar read: batches serve the scan; widening/null-fill/timestamp matrix is value-identical to the row path") {
    def isColumnar(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.collect {
        case c: org.apache.spark.sql.execution.ColumnarToRowExec => c
      }.nonEmpty
    val root = tmpDir("graft_dsv2_matrix") + "/t"
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      // batch 0: narrow shapes (int n, float f) + every other primitive
      ManifestTable.commit(spark, root,
        Seq((1, 1.5f, "a", true, Array[Byte](1, 2),
          java.sql.Date.valueOf("2024-01-05"),
          java.sql.Timestamp.valueOf("2024-01-05 01:02:03.000004"), "b0"))
          .toDF("n", "f", "s", "b", "bin", "d", "ts", "part"),
        "part", batchId = 0L)
      // batch 1: widened (long n, double f) + a brand-new column `extra`
      ManifestTable.commit(spark, root,
        Seq((2L, 2.5d, "b", false, Array[Byte](3),
          java.sql.Date.valueOf("2024-02-06"),
          java.sql.Timestamp.valueOf("2024-02-06 11:12:13.000014"),
          7L, "b1"))
          .toDF("n", "f", "s", "b", "bin", "d", "ts", "extra", "part"),
        "part", batchId = 1L)
    } finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val cdf = fmt(root)
    assert(isColumnar(cdf.select("n", "f", "s", "extra")),
      "an unmasked format read must plan COLUMNAR")
    sameFrame(cdf, ManifestTable.read(spark, root).get, "matrix vs Scala")
    // the ROW path twin: a pending mask (matching nothing) forces the row
    // reader; values must be identical to the columnar read of the same
    // snapshot — the per-file behavior matrix cannot drift between paths
    def render(df: DataFrame): Seq[String] = df.collect().map(_.toSeq.map {
      case a: Array[Byte] => a.toSeq.toString
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq
    val colRows = render(cdf)
    ManifestTable.deleteRowsDeferred(spark, root,
      Seq(-999L).toDF("extra"), "extra")
    val rdf = fmt(root)
    assert(!isColumnar(rdf), "a masked read must take the row path")
    assert(render(rdf) == colRows,
      "row and columnar paths diverged on the widening/null-fill matrix")
    ManifestTable.optimize(spark, root) // purge the no-op mask
    // spot values: widening + null fill + timestamp micros round-trip
    val r = fmt(root).orderBy("n").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(r.map(_.getDouble(1)).toSeq == Seq(1.5d, 2.5d))
    assert(r(0).isNullAt(r(0).fieldIndex("extra")) &&
      r(1).getLong(r(1).fieldIndex("extra")) == 7L)
    assert(r(0).getTimestamp(r(0).fieldIndex("ts")).toString
      == "2024-01-05 01:02:03.000004")
  }

  test("columnar read: a NANOS-timestamp file takes the per-file row bridge and divides to micros") {
    // craft what no Spark writer produces: an INT64 TIMESTAMP(NANOS) file
    // under a recorded TimestampType column — the vectorized reader
    // refuses this shape, the bridge divides ns -> us (the row matrix)
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val root = tmpDir("graft_dsv2_nanos") + "/t"
    val dir = new java.io.File(s"$root/part=b0"); dir.mkdirs()
    val msg = Types.buildMessage()
      .addField(Types.optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(
          true, LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts"))
      .named("spark_schema")
    val fp = new org.apache.hadoop.fs.Path(s"$root/part=b0/f0.parquet")
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        fp, spark.sparkContext.hadoopConfiguration))
      .withType(msg).build()
    val fac = new org.apache.parquet.example.data.simple.SimpleGroupFactory(msg)
    val nanos = 1704416523000004000L // 2024-01-05 01:02:03.000004 UTC in ns
    val g = fac.newGroup(); g.append("ts", nanos); w.write(g); w.close()
    // hand-write the manifest: schema records TimestampType
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType, true)))
    val b64 = java.util.Base64.getEncoder.encodeToString(
      sch.json.getBytes("UTF-8"))
    val mdir = new java.io.File(s"$root/_manifest"); mdir.mkdirs()
    val pw = new java.io.PrintWriter(s"$root/_manifest/v0.json")
    try pw.print(
      s"""{"version":0,"batch":0,"schemaB64":"$b64"}""" + "\npart=b0/f0.parquet")
    finally pw.close()
    val got = fmt(root).collect()
    assert(got.length == 1 && got(0).getTimestamp(0).toString
      == "2024-01-05 01:02:03.000004",
      s"NANOS bridge misdecoded: ${got.toSeq}")
  }

  test("streaming tail: versions stream as micro-batches; rewrites refuse; startingVersion replays from there") {
    val root = tmpDir("graft_dsv2_stream") + "/t"
    for (b <- 0 until 3)
      ManifestTable.commit(spark, root,
        (0 until 10).map(i => (100L * b + i, s"b$b")).toDF("k", "part"),
        "part", batchId = b.toLong, statsCol = Some("k"))
    def drain(startingVersion: Option[Long] = None): Seq[Long] = {
      val ckpt = tmpDir("graft_dsv2_stream_ckpt")
      val r0 = spark.readStream.format("graft-manifest")
      val r = startingVersion.fold(r0)(v =>
        r0.option("startingVersion", v.toString))
      val q = r.load(root).writeStream
        .format("memory").queryName("graft_stream_tail")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = spark.table("graft_stream_tail")
        .select("k").collect().map(_.getLong(0)).toSeq.sorted
      spark.sql("DROP VIEW IF EXISTS graft_stream_tail")
      out
    }
    // the whole retained history streams exactly once
    assert(drain() ==
      (0 until 3).flatMap(b => (0 until 10).map(i => 100L * b + i)).sorted)
    // startingVersion replays a suffix
    assert(drain(Some(2L)) == (200L until 210L).toSeq)
    // a rewriting version refuses loudly
    ManifestTable.commit(spark, root,
      (0 until 5).map(i => (900L + i, "b0")).toDF("k", "part"),
      "part", batchId = 3L) // REPLACES partition b0 — removals appear
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("ChangeFeed")),
      s"expected the removal refusal: ${chain(ex)}")
  }

  test("storage-partitioned join: co-partitioned manifest tables join with ZERO shuffles under v2 bucketing") {
    def mk(name: String, n: Int): String = {
      val root = tmpDir(name) + "/t"
      ManifestTable.commit(spark, root,
        (0 until n).map(i => (i.toLong, s"v$i",
          (i % 4))).toDF("k", "s", "bucket"),
        "bucket", batchId = 0L)
      root
    }
    val ra = mk("graft_dsv2_spj_a", 40)
    val rb = mk("graft_dsv2_spj_b", 24)
    def shuffles(df: DataFrame): Int = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val here = p match {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
          case _ => 0
        }
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case other => other.children
        }
        here + kids.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    val expect = (0 until 24).map(i => (i.toLong, s"v$i", s"v$i")).toSet
    def joined(): DataFrame =
      fmt(ra).select(col("bucket"), col("k"), col("s").as("sa"))
        .join(fmt(rb).select(col("bucket"), col("k"), col("s").as("sb")),
          Seq("bucket", "k"))
        .select("k", "sa", "sb")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // the join clusters on (bucket, k) — a SUPERSET of the partition key;
    // co-partitioning on the subset needs this off (the standard SPJ
    // setup, same as Iceberg's)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = joined()
      val got = q.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == expect, "SPJ join values diverged")
      assert(shuffles(q) == 0,
        s"expected a shuffle-free storage-partitioned join: " +
          q.queryExecution.executedPlan)
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    // conf off (the default): same values through ordinary exchanges
    // (broadcast still disabled so the control really shuffles), and the
    // scan keeps its bin-packed parallelism
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q2 = joined()
      val got2 = q2.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got2 == expect && shuffles(q2) > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // COMPOSITE keys (round 17): two MULTI-LEVEL (d, g)-partitioned
    // tables join shuffle-free on both levels under v2 bucketing
    def mkMulti(name: String, n: Int): String = {
      val root = tmpDir(name) + "/t"
      spark.sql(s"DROP TABLE IF EXISTS ${name}_t")
      spark.sql(s"CREATE TABLE ${name}_t (k BIGINT, s STRING, d STRING, " +
        s"g STRING) USING `graft-manifest` OPTIONS (path '$root') " +
        "PARTITIONED BY (d, g)")
      (0 until n).map(i => (i.toLong, s"v$i", s"d${i % 2}", s"g${i % 3}"))
        .toDF("k", "s", "d", "g").createOrReplaceTempView(s"${name}_src")
      spark.sql(s"INSERT INTO ${name}_t SELECT * FROM ${name}_src")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_t")
      spark.catalog.dropTempView(s"${name}_src")
      root
    }
    val rma = mkMulti("graft_spjm_a", 36)
    val rmb = mkMulti("graft_spjm_b", 24)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val qm = fmt(rma).select(col("d"), col("g"), col("k"), col("s").as("sa"))
        .join(fmt(rmb).select(col("d"), col("g"), col("k"), col("s").as("sb")),
          Seq("d", "g", "k"))
        .select("k", "sa", "sb")
      val gotM = qm.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(gotM == (0 until 24).map(i => (i.toLong, s"v$i", s"v$i")).toSet,
        "composite SPJ join values diverged")
      assert(shuffles(qm) == 0,
        s"expected a shuffle-free composite-key storage-partitioned join:\n" +
          qm.queryExecution.executedPlan)
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("a raw parquet read of the table root is refused by the sentinel; the format read is unaffected") {
    val root = tmpDir("graft_dsv2_guard") + "/t"
    ManifestTable.commit(spark, root,
      Seq((1L, "b0"), (2L, "b1")).toDF("k", "part"), "part", batchId = 0L)
    assert(new java.io.File(root, ManifestTable.SentinelFile).exists(),
      "commit did not plant the raw-read sentinel")
    intercept[Exception] {
      spark.read.parquet(root).collect()
    }
    assert(fmt(root).count() == 2L)
    assert(ManifestTable.read(spark, root).get.count() == 2L)
    assert(ManifestTable.fsck(spark, root).ok,
      "the sentinel must not count as corruption or an orphan")
    // vacuum never sweeps it
    ManifestTable.vacuum(spark, root, keepVersions = 1)
    assert(new java.io.File(root, ManifestTable.SentinelFile).exists())
  }

  test("an empty (or all-null) runtime key set keeps no files and never crashes (a zero-row DPP build side is routine)") {
    val root = tmpDir("graft_dsv2_dpp0") + "/t"
    for (b <- 0 until 3)
      ManifestTable.commit(spark, root,
        (0 until 5).map(i => (100L * b + i, s"b$b")).toDF("k", "part")
          .repartition(1), "part", batchId = b.toLong, statsCol = Some("k"))
    import org.apache.spark.sql.sources.In
    // direct pins: empty and all-null In on the ZONE column (the branch
    // that reached ls.min on the empty set — ADVICE, round 16), and on
    // the partition column
    for (f <- Seq(In("k", Array.empty[Any]), In("k", Array[Any](null)),
        In("part", Array.empty[Any]))) {
      val scan = graftScans(fmt(root)).head
      assert(scan.chosenFiles.size == 3)
      scan.filter(Array[org.apache.spark.sql.sources.Filter](f))
      assert(scan.chosenFiles.isEmpty,
        s"$f: an empty observed key set provably matches no rows")
    }
    // end-to-end: a DPP-shaped join whose build side yields ZERO rows
    // must return zero rows, not throw
    val dimDir = tmpDir("graft_dsv2_dpp0_dim")
    Seq(("b0", "keep")).toDF("part", "label").write
      .mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("label") === "nomatch")
    assert(fmt(root).join(broadcast(dim), Seq("part")).count() == 0L)
    val dimK = spark.read.parquet(dimDir)
      .filter(col("label") === "nomatch").select(lit(1L).as("k"))
    assert(fmt(root).join(broadcast(dimK), Seq("k")).count() == 0L)
  }

  test("planning materializes the file-length map once per call, not once per file") {
    val root = tmpDir("graft_dsv2_lens") + "/t"
    for (b <- 0 until 4)
      ManifestTable.commit(spark, root,
        (0 until 5).map(i => (10L * b + i, s"b$b")).toDF("k", "part")
          .repartition(1), "part", batchId = b.toLong)
    val scan = graftScans(fmt(root)).head
    scan.lensBuilds = 0
    assert(scan.planInputPartitions().nonEmpty)
    assert(scan.lensBuilds == 1,
      s"planInputPartitions built the lens map ${scan.lensBuilds} times " +
        "for 4 files — the per-file rebuild is O(N²) driver work (and " +
        "O(N²) status RPCs on pre-meta manifests)")
    // the clustered (storage-partitioned) branch obeys the same law
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val scan2 = graftScans(fmt(root)).head
      scan2.lensBuilds = 0
      assert(scan2.planInputPartitions().length == 4)
      assert(scan2.lensBuilds == 1,
        s"clustered branch built the lens map ${scan2.lensBuilds} times")
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("aggregate planning probes the deferred-delete mask exactly once") {
    val root = tmpDir("graft_dsv2_aggprobe") + "/t"
    ManifestTable.commit(spark, root,
      (0 until 10).map(i => (i.toLong, "b0")).toDF("k", "part"),
      "part", batchId = 0L, statsCol = Some("k"))
    val before = ManifestTable.dvProbeCount.get()
    val r = fmt(root).agg(count(lit(1)).as("n"), min(col("k")).as("mn"),
      max(col("k")).as("mx")).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 0L, 9L)))
    val probes = ManifestTable.dvProbeCount.get() - before
    assert(probes == 1L,
      s"planning one pushed aggregate ran $probes mask probes — " +
        "supportCompletePushDown and pushAggregation must share one " +
        "memoized resolution (each probe is a listStatus RPC on an " +
        "object store)")
  }

  test("readChangeFeed: per-version insert/delete rows; windows select; the feed reconstructs any snapshot; refusal combos") {
    val root = tmpDir("graft_dsv2_cdf") + "/t"
    for (b <- 0 until 3)
      ManifestTable.commit(spark, root,
        (0 until 10).map(i => (100L * b + i, s"b$b")).toDF("k", "part"),
        "part", batchId = b.toLong, statsCol = Some("k"))
    // v3: a takedown REWRITE of partition b1 (removes its file, adds the
    // survivor file)
    ManifestTable.deleteRows(spark, root,
      Seq(103L, 107L).toDF("k"), "k")
    def feed(opts: (String, String)*): DataFrame = {
      val r0 = spark.read.format("graft-manifest")
        .option("readChangeFeed", "true")
      opts.foldLeft(r0) { case (r, (k, v)) => r.option(k, v) }.load(root)
    }
    val all = feed().select("k", "part", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // per-version granularity: v0/v1/v2 = 10 inserts each; v3 = 10
    // deletes (b1's old file) + 8 inserts (the survivors)
    assert(all.count(x => x._3 == "insert" && x._4 == 1L) == 10)
    assert(all.count(x => x._3 == "delete" && x._4 == 3L) == 10)
    assert(all.count(x => x._3 == "insert" && x._4 == 3L) == 8)
    assert(all.count(_._3 == "delete") == 10)
    assert(all.length == 48)
    // a window selects only its versions (startingVersion inclusive)
    val w = feed("startingVersion" -> "2", "endingVersion" -> "2")
      .select("_commit_version").collect().map(_.getLong(0))
    assert(w.length == 10 && w.forall(_ == 2L))
    // the feed reconstructs the snapshot: inserts EXCEPT ALL deletes
    val f = feed()
    val ins = f.filter(col("_change_type") === "insert").select("k", "part")
    val del = f.filter(col("_change_type") === "delete").select("k", "part")
    val rebuilt = ins.exceptAll(del)
    val snap = ManifestTable.read(spark, root).get.select("k", "part")
    assert(rebuilt.exceptAll(snap).isEmpty && snap.exceptAll(rebuilt).isEmpty,
      "the feed-reconstructed state diverged from the snapshot")
    // column pruning through the wrapper (cdf columns alone)
    assert(feed().select("_change_type").collect().length == 48)
    // refusals: versionAsOf combo; inverted window
    intercept[Exception] {
      feed("versionAsOf" -> "1").collect()
    }
    intercept[Exception] {
      feed("startingVersion" -> "3", "endingVersion" -> "1").collect()
    }
  }

  test("readChangeFeed pushdown: key/partition filters bound each version's changed files, feed columns clamp the plan, zero per-file probes") {
    val root = tmpDir("graft_dsv2_cdfpd") + "/t"
    for (b <- 0 until 3)
      ManifestTable.commit(spark, root,
        (0 until 10).map(i => (100L * b + i, s"b$b")).toDF("k", "part"),
        "part", batchId = b.toLong, statsCol = Some("k"))
    ManifestTable.deleteRows(spark, root, Seq(103L, 107L).toDF("k"), "k")
    def feed: DataFrame = spark.read.format("graft-manifest")
      .option("readChangeFeed", "true").load(root)
    def cdfScans(df: DataFrame): Seq[GraftCdfScan] = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[GraftCdfScan] = {
        val here = p match {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[GraftCdfScan] =>
            Seq(b.scan.asInstanceOf[GraftCdfScan])
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
    def planned(df: DataFrame): Seq[GraftCdfPartition] =
      cdfScans(df).flatMap(_.plannedPartitions.toSeq)
        .map(_.asInstanceOf[GraftCdfPartition])
    def nFiles(df: DataFrame): Int = planned(df).map(_.files.length).sum
    val probes0 = GraftCdfScan.lenProbeCount.get()
    val baseCols = Seq("k", "_change_type", "_commit_version")
    val baseFiles = nFiles(feed.select(baseCols.map(col): _*))
    assert(baseFiles >= 5, s"v0..v2 inserts + v3 delete+insert: $baseFiles")
    // ZONE pruning: k=205 lives only in v2's added file — every other
    // version's changed files are outside the key's envelope
    val q = feed.filter(col("k") === 205L).select(baseCols.map(col): _*)
    assert(q.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((205L, "insert", 2L)))
    assert(nFiles(q) < baseFiles && planned(q).nonEmpty &&
      planned(q).forall(p => p.version == 2L && p.changeType == "insert"),
      s"zone pushdown must keep v2 insert file(s) only: ${planned(q)}")
    // PARTITION pruning bounds the feed to one lineage's files
    val qp = feed.filter(col("part") === "b0").select(baseCols.map(col): _*)
    assert(qp.count() == 10L && nFiles(qp) < baseFiles &&
      planned(qp).forall(_.version == 0L))
    // _change_type drops the other SIDE wholesale
    val qi = feed.filter(col("_change_type") === "insert")
      .select(baseCols.map(col): _*)
    assert(qi.count() == 38L)
    assert(planned(qi).forall(_.changeType == "insert"))
    // _commit_version clamps the version WINDOW before any manifest read
    val qv = feed.filter(col("_commit_version") === 1L)
      .select(baseCols.map(col): _*)
    assert(qv.collect().map(_.getLong(0)).sorted.toSeq ==
      (0 until 10).map(100L + _))
    assert(planned(qv).forall(_.version == 1L) && nFiles(qv) < baseFiles)
    // pushdown changes FILES, never VALUES: residual filters serve the
    // same rows the unfiltered feed would after a post-filter
    val full = feed.select(baseCols.map(col): _*).collect()
      .filter(r => r.getLong(0) >= 100L && r.getLong(0) <= 109L).toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val pushed = feed.filter(col("k").between(100L, 109L))
      .select(baseCols.map(col): _*).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(pushed == full)
    // _commit_timestamp (round 18): every change row carries its
    // version's publish time, matching the manifest header's own ts and
    // ascending with version order
    val ts = feed.select("_commit_version", "_commit_timestamp").distinct()
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).sortBy(_._1)
    assert(ts.forall(_._2 != null),
      "commit timestamps must be present on post-round-18 versions")
    val hist = ManifestTable.history(spark, root)
      .map(e => e.version -> e.timestampMs.get).toMap
    ts.foreach { case (v, t) =>
      assert(t.getTime == hist(v), s"v$v feed ts $t != header ${hist(v)}")
    }
    // history metrics ride the same headers: live file/row counts per
    // version, zero extra IO
    val h3 = ManifestTable.history(spark, root).find(_.version == 2L).get
    assert(h3.numFiles.exists(_ > 0) && h3.numRows.contains(30L),
      s"v2 should report 3 batches x 10 rows live: $h3")
    // the U31 law on the feed: `%#`-meta tables plan with ZERO per-file
    // filesystem probes, however many plans this test ran
    assert(GraftCdfScan.lenProbeCount.get() == probes0,
      "CDF planning ran per-file getFileStatus probes on a meta-carrying " +
        "table")
  }

  test("streaming readChangeFeed: rewriting tables stream as insert/delete deltas; incremental catch-up; admission bound") {
    val root = tmpDir("graft_dsv2_cdfs") + "/t"
    for (b <- 0 until 3)
      ManifestTable.commit(spark, root,
        (0 until 10).map(i => (100L * b + i, s"b$b")).toDF("k", "part"),
        "part", batchId = b.toLong)
    ManifestTable.deleteRows(spark, root, Seq(103L, 107L).toDF("k"), "k")
    val ckpt = tmpDir("graft_dsv2_cdfs_ckpt")
    val sink = tmpDir("graft_dsv2_cdfs_sink")
    // a RESUMABLE sink (parquet) — the second drain must catch up from
    // the same checkpoint (memory sinks refuse recovery)
    def drain(): Seq[(Long, String, Long)] = {
      val q = spark.readStream.format("graft-manifest")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(root)
        .select("k", "_change_type", "_commit_version")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(sink).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    }
    val first = drain()
    // the whole history streamed — the REWRITE version included (the
    // plain tail refuses it; the CDC stream is exactly for this)
    assert(first.length == 48)
    assert(first.count(_._2 == "delete") == 10)
    assert(first.count(x => x._2 == "insert" && x._3 == 3L) == 8)
    // one version per micro-batch under the admission bound: >= 4
    // committed offsets for 4 versions
    val nBatches = new java.io.File(ckpt, "offsets").listFiles()
      .count(_.getName.matches("\\d+"))
    assert(nBatches >= 4, s"4 versions under maxVersionsPerTrigger=1 " +
      s"drained in $nBatches batches")
    // incremental catch-up: a later commit streams ONLY its delta (the
    // sink accumulates — the second drain adds exactly one row)
    ManifestTable.commit(spark, root,
      Seq((900L, "b9")).toDF("k", "part"), "part", batchId = 9L)
    val second = drain()
    assert(second.length == first.length + 1 &&
      second.count(x => x._1 == 900L && x._2 == "insert") == 1,
      s"catch-up streamed more than the delta: ${second.length} rows " +
        s"vs first ${first.length}")
    // endingVersion is a batch-window option — the stream refuses it
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-manifest")
        .option("readChangeFeed", "true").option("endingVersion", "2")
        .load(root)
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("graft_dsv2_cdfs_bad"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("endingVersion")), chain(ex))
  }

  test("native streaming sink: epochs commit exactly-once under the fence; a replayed run no-ops; complete mode refuses") {
    val root = tmpDir("graft_dsv2_sink") + "/t"
    val srcDir = tmpDir("graft_dsv2_sink_src")
    for (b <- 0 until 3)
      (0 until 10).map(i => (100L * b + i, s"p${i % 2}"))
        .toDF("k", "part").coalesce(1)
        .write.mode("append").parquet(srcDir)
    val srcSchema = new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
      .add("part", org.apache.spark.sql.types.StringType)
    def drain(ckpt: String): Unit = {
      val q = spark.readStream.schema(srcSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .writeStream.format("graft-manifest")
        .option("path", root)
        .option("partitionCol", "part")
        .option("statsColumns", "k")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain(tmpDir("graft_dsv2_sink_ckpt"))
    val expect = (0 until 3).flatMap(b =>
      (0 until 10).map(i => 100L * b + i)).toSet
    assert(fmt(root).select("k").collect().map(_.getLong(0)).toSet == expect)
    // one manifest version per epoch, fence = last epoch
    val v1 = ManifestTable.currentVersion(spark, root)
    assert(v1 == 2L, s"expected 3 epoch commits, head version $v1")
    assert(ManifestTable.lastBatch(spark, root) == 2L)
    // the sink's statsColumns registered zone maps: a range filter prunes
    val q2 = fmt(root).filter(col("k") >= 100L && col("k") <= 109L)
    assert(q2.count() == 10L)
    assert(graftScans(q2).head.chosenFiles.size <
      graftScans(fmt(root)).head.chosenFiles.size,
      "sink-registered zone maps did not prune")
    // REDELIVERY: a fresh checkpoint replays epochs 0..2 — every commit
    // lands on or below the fence and must no-op (value identity + no
    // new version)
    drain(tmpDir("graft_dsv2_sink_ckpt2"))
    assert(ManifestTable.currentVersion(spark, root) == v1,
      "replayed epochs must fence-skip, not re-commit")
    assert(fmt(root).select("k").collect().map(_.getLong(0)).toSet == expect)
    // complete mode (truncate-per-epoch) refuses loudly
    val ex = intercept[Exception] {
      val q = spark.readStream.schema(srcSchema).parquet(srcDir)
        .groupBy(col("part")).count()
        .writeStream.format("graft-manifest")
        .outputMode("complete")
        .option("path", root).option("partitionCol", "part")
        .option("checkpointLocation", tmpDir("graft_dsv2_sink_ckpt3"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("append-only")),
      s"wrong complete-mode refusal: ${chain(ex)}")
  }

  test("maxVersionsPerTrigger bounds one micro-batch's version span; the history drains in several batches with identical contents") {
    val root = tmpDir("graft_dsv2_admis") + "/t"
    for (b <- 0 until 8)
      ManifestTable.commit(spark, root,
        (0 until 5).map(i => (100L * b + i, s"b$b")).toDF("k", "part"),
        "part", batchId = b.toLong)
    def drain(cap: Option[Long]): (Seq[Long], Int) = {
      val ckpt = tmpDir("graft_dsv2_admis_ckpt")
      val r0 = spark.readStream.format("graft-manifest")
      val r = cap.fold(r0)(k => r0.option("maxVersionsPerTrigger", k.toString))
      val q = r.load(root).writeStream
        .format("memory").queryName("graft_admis_tail")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = spark.table("graft_admis_tail")
        .select("k").collect().map(_.getLong(0)).toSeq.sorted
      spark.sql("DROP VIEW IF EXISTS graft_admis_tail")
      // committed batches = offset files the checkpoint recorded
      val nBatches = new java.io.File(ckpt, "offsets").listFiles()
        .count(_.getName.matches("\\d+"))
      (out, nBatches)
    }
    val expect =
      (0 until 8).flatMap(b => (0 until 5).map(i => 100L * b + i)).sorted
    val (unbounded, n1) = drain(None)
    assert(unbounded == expect)
    val (bounded, n2) = drain(Some(2L))
    assert(bounded == expect,
      "admission control changed WHAT streamed, not just how")
    assert(n2 >= 4,
      s"8 versions under maxVersionsPerTrigger=2 drained in $n2 " +
        s"batch(es) — expected >= 4 (unbounded took $n1)")
    // a non-positive cap refuses at stream start
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-manifest")
        .option("maxVersionsPerTrigger", "0").load(root)
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("graft_dsv2_admis_bad"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("maxVersionsPerTrigger")),
      s"wrong refusal: ${chain(ex)}")
  }
}
