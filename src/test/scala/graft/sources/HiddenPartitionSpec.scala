package graft.sources

import graft.SparkSpec
import graft.core.ManifestTable
import org.apache.spark.sql.functions._

/** HIDDEN-PARTITION TRANSFORMS (round 19 — SURVEY §9 #1, the Iceberg
  * flagship event-table shape): `PARTITIONED BY (days(ts))` /
  * `bucket(n, id)` derive the directory layout from data columns; the
  * user filters `ts`/`id` and the scan prunes leaves they never named.
  */
class HiddenPartitionSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse = tmpDir("graft_hidden_wh")

  private def register(name: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", warehouse)
  }

  private def graftScan(df: org.apache.spark.sql.DataFrame): GraftManifestScan =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.isInstanceOf[GraftManifestScan] =>
        b.scan.asInstanceOf[GraftManifestScan]
    }.head

  test("days(ts): layout derives day leaves; a ts-range query PRUNES days the user never named; the level stays hidden") {
    register("ghp1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp1.ev")
    spark.sql("CREATE TABLE ghp1.ev.clicks (k BIGINT, v STRING, " +
      "ts TIMESTAMP) USING `graft-manifest` PARTITIONED BY (days(ts))")
    // 6 UTC days x 4 rows
    val rows = (0 until 24).map { i =>
      (i.toLong, s"v$i",
        java.sql.Timestamp.from(java.time.Instant.parse(
          f"2024-03-${10 + i % 6}%02dT0${i % 10}:30:00Z")))
    }
    rows.toDF("k", "v", "ts").createOrReplaceTempView("ghp1_src")
    spark.sql("INSERT INTO ghp1.ev.clicks SELECT * FROM ghp1_src")
    // the derived level is a real directory, named <col>_day, ISO-valued
    val root = s"$warehouse/ev/clicks"
    val leaves = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("ts_day="))
      .sorted
    assert(leaves.length == 6 && leaves.head == "ts_day=2024-03-10",
      leaves.mkString(","))
    // ts_day is HIDDEN: not in the schema, SELECT * never shows it
    assert(!spark.table("ghp1.ev.clicks").schema.fieldNames
      .contains("ts_day"))
    // the data column ts IS in the files (not directory-only)
    assert(spark.table("ghp1.ev.clicks").select("ts").distinct().count() > 6)
    // a 2-day range filter on ts opens ONLY those days' files
    val q = spark.sql("SELECT k FROM ghp1.ev.clicks WHERE " +
      "ts >= TIMESTAMP'2024-03-11 00:00:00' AND " +
      "ts < TIMESTAMP'2024-03-13 00:00:00'")
    val expect = rows.filter { case (_, _, t) =>
      !t.before(java.sql.Timestamp.valueOf("2024-03-11 00:00:00")) &&
        t.before(java.sql.Timestamp.valueOf("2024-03-13 00:00:00"))
    }.map(_._1).sorted
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == expect)
    val scan = graftScan(q)
    assert(scan.totalFiles > scan.chosenFiles.size,
      s"day pruning must skip leaves: ${scan.chosenFiles}")
    assert(scan.chosenFiles.forall(r =>
      r.startsWith("ts_day=2024-03-11/") || r.startsWith("ts_day=2024-03-12/")),
      s"chosen files must come only from the two filtered days: " +
        scan.chosenFiles.mkString(","))
    // equality on a single instant prunes to ONE day leaf
    val q1 = spark.sql("SELECT k FROM ghp1.ev.clicks WHERE " +
      "ts = TIMESTAMP'2024-03-10 00:30:00'")
    val s1 = graftScan(q1)
    assert(s1.chosenFiles.forall(_.startsWith("ts_day=2024-03-10/")))
    assert(q1.collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("bucket(n, id): equality/IN prunes to the hashed buckets; full scans and values stay exact") {
    register("ghp2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp2.ev")
    spark.sql("CREATE TABLE ghp2.ev.users (id BIGINT, nm STRING) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(8, id))")
    (0L until 400L).map(i => (i, s"u$i")).toDF("id", "nm")
      .createOrReplaceTempView("ghp2_src")
    spark.sql("INSERT INTO ghp2.ev.users SELECT * FROM ghp2_src")
    val root = s"$warehouse/ev/users"
    val leaves = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("id_bucket=")).sorted
    assert(leaves.length == 8, leaves.mkString(","))
    assert(!spark.table("ghp2.ev.users").schema.fieldNames
      .contains("id_bucket"))
    // point lookup: exactly one bucket's files open
    val q = spark.sql("SELECT nm FROM ghp2.ev.users WHERE id = 137")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("u137"))
    val scan = graftScan(q)
    val bk = PartitionTransforms.bucketOfLong(137L, 8)
    assert(scan.chosenFiles.nonEmpty &&
      scan.chosenFiles.forall(_.startsWith(s"id_bucket=$bk/")),
      s"expected only bucket $bk: ${scan.chosenFiles.mkString(",")}")
    assert(scan.chosenFiles.size < scan.totalFiles)
    // IN over two ids: at most two buckets
    val q2 = spark.sql(
      "SELECT count(*) FROM ghp2.ev.users WHERE id IN (3, 250)")
    assert(q2.head.getLong(0) == 2L)
    val bks = Set(3L, 250L).map(PartitionTransforms.bucketOfLong(_, 8))
      .map(b => s"id_bucket=$b/")
    assert(graftScan(spark.sql(
      "SELECT nm FROM ghp2.ev.users WHERE id IN (3, 250)"))
      .chosenFiles.forall(r => bks.exists(r.startsWith)))
    // a RANGE on id does NOT translate (hash destroys order) but stays
    // correct
    assert(spark.sql(
      "SELECT count(*) FROM ghp2.ev.users WHERE id < 10")
      .head.getLong(0) == 10L)
  }

  test("bucket sources carry ZONE MAPS by default (round 20): a range on the hashed column skips files, values exact") {
    // bucket() hashes away order, so ranges can't narrow DIRECTORIES —
    // but the auto-registered source-column zone maps recover range
    // pruning at the FILE level with zero new machinery (VERDICT r19 #6)
    register("ghp9")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp9.ev")
    spark.sql("CREATE TABLE ghp9.ev.zusers (id BIGINT, nm STRING) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(8, id))") // no statsColumns asked
    (0L until 400L).map(i => (i, s"u$i")).toDF("id", "nm")
      .createOrReplaceTempView("ghp9_src_a")
    spark.sql("INSERT INTO ghp9.ev.zusers SELECT * FROM ghp9_src_a")
    (1000L until 1400L).map(i => (i, s"u$i")).toDF("id", "nm")
      .createOrReplaceTempView("ghp9_src_b")
    spark.sql("INSERT INTO ghp9.ev.zusers SELECT * FROM ghp9_src_b")
    // each bucket now holds a [0,399]-era file and a [1000,1399]-era
    // file; a range query over the SECOND era must skip the first's
    val q = spark.sql(
      "SELECT count(*) FROM ghp9.ev.zusers WHERE id >= 1000 AND id < 1100")
    assert(q.head.getLong(0) == 100L)
    val scan = graftScan(spark.sql(
      "SELECT nm FROM ghp9.ev.zusers WHERE id >= 1000 AND id < 1100"))
    assert(scan.chosenFiles.nonEmpty &&
      scan.chosenFiles.size < scan.totalFiles,
      s"default bucket-source zone maps did not skip: " +
        s"${scan.chosenFiles.size}/${scan.totalFiles}")
    // values survive the pruning exactly
    assert(spark.sql("SELECT count(*) FROM ghp9.ev.zusers")
      .head.getLong(0) == 800L)
  }

  test("mixed layout days(ts) + identity lang: both levels prune; verbs stay transform-safe (optimize, dropPartitions, DELETE)") {
    register("ghp3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp3.ev")
    // identity partition columns declare LAST (the format's column-order
    // convention: the committed schema is data columns then identity
    // levels — a transform's SOURCE column is data, so it sits with them)
    spark.sql("CREATE TABLE ghp3.ev.logs (k BIGINT, ts TIMESTAMP, " +
      "lang STRING) USING `graft-manifest` " +
      "PARTITIONED BY (days(ts), lang)")
    // lang varies WITHIN each day (i/4 decouples it from i%4's day)
    val rows = (0 until 40).map { i =>
      (i.toLong, if ((i / 4) % 2 == 0) "en" else "de",
        java.sql.Timestamp.from(java.time.Instant.parse(
          f"2024-05-${20 + i % 4}%02dT08:0${i % 6}:00Z")))
    }
    rows.map(r => (r._1, r._3, r._2))
      .toDF("k", "ts", "lang").createOrReplaceTempView("ghp3_src")
    // two inserts → multiple files per leaf, so optimize has work
    spark.sql("INSERT INTO ghp3.ev.logs SELECT * FROM ghp3_src WHERE k < 20")
    spark.sql("INSERT INTO ghp3.ev.logs SELECT * FROM ghp3_src WHERE k >= 20")
    assert(spark.sql("SELECT count(*) FROM ghp3.ev.logs")
      .head.getLong(0) == 40L)
    // both levels prune together
    val q = spark.sql("SELECT k FROM ghp3.ev.logs WHERE lang = 'en' AND " +
      "ts >= TIMESTAMP'2024-05-21 00:00:00' AND " +
      "ts < TIMESTAMP'2024-05-22 00:00:00'")
    val scan = graftScan(q)
    assert(scan.chosenFiles.nonEmpty && scan.chosenFiles.forall(r =>
      r.startsWith("ts_day=2024-05-21/lang=en/")),
      scan.chosenFiles.mkString(","))
    val expected = rows.filter(r => r._2 == "en" &&
      r._3.toInstant.toString.startsWith("2024-05-21")).map(_._1).sorted
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == expected)
    val root = s"$warehouse/ev/logs"
    // OPTIMIZE folds per leaf, preserving the derived layout
    val stats = ManifestTable.optimize(spark, root)
    assert(stats.nonEmpty && stats.forall(s =>
      s.partition.startsWith("ts_day=") && s.partition.contains("/lang=")),
      stats.toString)
    assert(spark.sql("SELECT count(*) FROM ghp3.ev.logs")
      .head.getLong(0) == 40L)
    // SQL DELETE (COW road): rewrites re-derive leaves from ts
    spark.sql("DELETE FROM ghp3.ev.logs WHERE k IN (0, 1, 2, 3)")
    assert(spark.sql("SELECT count(*) FROM ghp3.ev.logs")
      .head.getLong(0) == 36L)
    assert(spark.sql("SELECT k FROM ghp3.ev.logs WHERE " +
      "ts < TIMESTAMP'2024-05-21 00:00:00'").collect()
      .map(_.getLong(0)).sorted.toSeq ==
      rows.filter(r => r._3.toInstant.toString.startsWith("2024-05-20"))
        .map(_._1).filter(_ > 3).sorted)
    // dropPartitions TTLs by the FIRST level's derived day value
    val dropped = ManifestTable.dropPartitions(
      spark, root, Seq("2024-05-20"))
    assert(dropped.exists(_ > 0L))
    assert(spark.sql("SELECT count(*) FROM ghp3.ev.logs WHERE " +
      "ts < TIMESTAMP'2024-05-21 00:00:00'").head.getLong(0) == 0L)
  }

  test("UPDATE on a days table re-derives the leaf when ts moves days (COW road through the transform writer)") {
    register("ghp4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp4.ev")
    spark.sql("CREATE TABLE ghp4.ev.t (k BIGINT, ts TIMESTAMP) " +
      "USING `graft-manifest` PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO ghp4.ev.t VALUES " +
      "(1, TIMESTAMP'2024-01-01 10:00:00')," +
      "(2, TIMESTAMP'2024-01-01 11:00:00')," +
      "(3, TIMESTAMP'2024-01-02 09:00:00')")
    spark.sql("UPDATE ghp4.ev.t SET ts = TIMESTAMP'2024-01-05 10:00:00' " +
      "WHERE k = 1")
    // the moved row now lives in (and prunes from) its NEW day
    val q = spark.sql("SELECT k FROM ghp4.ev.t WHERE " +
      "ts >= TIMESTAMP'2024-01-05 00:00:00'")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(graftScan(q).chosenFiles.forall(
      _.startsWith("ts_day=2024-01-05/")))
    assert(spark.sql("SELECT count(*) FROM ghp4.ev.t").head.getLong(0) == 3L)
    // physical layout agrees
    val leaves = new java.io.File(s"$warehouse/ev/t").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("ts_day=")).toSet
    assert(leaves.contains("ts_day=2024-01-05"), leaves.toString)
  }

  test("months(ts): a quarter range prunes month leaves; an exact month-start `<` excludes its month") {
    register("ghp5")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp5.ev")
    spark.sql("CREATE TABLE ghp5.ev.sales (k BIGINT, ts TIMESTAMP) " +
      "USING `graft-manifest` PARTITIONED BY (months(ts))")
    val rows = (0 until 24).map { i =>
      (i.toLong, java.sql.Timestamp.from(java.time.Instant.parse(
        f"2024-${1 + i % 12}%02d-15T08:00:00Z")))
    }
    rows.toDF("k", "ts").createOrReplaceTempView("ghp5_src")
    spark.sql("INSERT INTO ghp5.ev.sales SELECT * FROM ghp5_src")
    val leaves = new java.io.File(s"$warehouse/ev/sales").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("ts_month=")).sorted
    assert(leaves.length == 12 && leaves.head == "ts_month=2024-01",
      leaves.mkString(","))
    // Q2: ts in [Apr 1, Jul 1) — exactly three month leaves open
    val q = spark.sql("SELECT k FROM ghp5.ev.sales WHERE " +
      "ts >= TIMESTAMP'2024-04-01 00:00:00' AND " +
      "ts < TIMESTAMP'2024-07-01 00:00:00'")
    val scan = graftScan(q)
    assert(scan.chosenFiles.nonEmpty && scan.chosenFiles.forall(r =>
      r.startsWith("ts_month=2024-04/") || r.startsWith("ts_month=2024-05/")
        || r.startsWith("ts_month=2024-06/")),
      scan.chosenFiles.mkString(","))
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
      rows.filter(r => Seq(4, 5, 6).contains(
        r._2.toInstant.atZone(java.time.ZoneOffset.UTC).getMonthValue))
        .map(_._1).sorted)
  }

  test("hours(ts) and years(d): the other calendar units derive, prune and stay hidden") {
    register("ghp6")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp6.ev")
    spark.sql("CREATE TABLE ghp6.ev.ticks (k BIGINT, ts TIMESTAMP) " +
      "USING `graft-manifest` PARTITIONED BY (hours(ts))")
    (0 until 12).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse(
        f"2024-03-10T${8 + i % 3}%02d:${10 + i}%02d:00Z"))))
      .toDF("k", "ts").createOrReplaceTempView("ghp6_src")
    spark.sql("INSERT INTO ghp6.ev.ticks SELECT * FROM ghp6_src")
    val hourLeaves = new java.io.File(s"$warehouse/ev/ticks").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("ts_hour=")).sorted
    assert(hourLeaves.toSeq == Seq("ts_hour=2024-03-10-08",
      "ts_hour=2024-03-10-09", "ts_hour=2024-03-10-10"),
      hourLeaves.mkString(","))
    val q = spark.sql("SELECT k FROM ghp6.ev.ticks WHERE " +
      "ts >= TIMESTAMP'2024-03-10 09:00:00' AND " +
      "ts < TIMESTAMP'2024-03-10 10:00:00'")
    assert(graftScan(q).chosenFiles.forall(
      _.startsWith("ts_hour=2024-03-10-09/")))
    assert(q.count() == 4L)
    // years over a DATE column
    spark.sql("CREATE TABLE ghp6.ev.annual (k BIGINT, d DATE) " +
      "USING `graft-manifest` PARTITIONED BY (years(d))")
    spark.sql("INSERT INTO ghp6.ev.annual VALUES " +
      "(1, DATE'2022-06-01'), (2, DATE'2023-06-01'), (3, DATE'2024-06-01')")
    val yearLeaves = new java.io.File(s"$warehouse/ev/annual").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("d_year=")).sorted
    assert(yearLeaves.toSeq == Seq("d_year=2022", "d_year=2023",
      "d_year=2024"), yearLeaves.mkString(","))
    val qy = spark.sql(
      "SELECT k FROM ghp6.ev.annual WHERE d >= DATE'2023-01-01'")
    assert(qy.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(graftScan(qy).chosenFiles.forall(r =>
      r.startsWith("d_year=2023/") || r.startsWith("d_year=2024/")))
  }

  test("truncate(w, col): int ranges translate (order-preserving); string prefixes prune equality") {
    register("ghp7")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp7.ev")
    spark.sql("CREATE TABLE ghp7.ev.ids (id BIGINT, v STRING) " +
      "USING `graft-manifest` PARTITIONED BY (truncate(100, id))")
    (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("ghp7_src")
    spark.sql("INSERT INTO ghp7.ev.ids SELECT * FROM ghp7_src")
    val leaves = new java.io.File(s"$warehouse/ev/ids").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("id_trunc="))
    assert(leaves.length == 10, leaves.mkString(","))
    // a range spanning two 100-buckets opens exactly those
    val q = spark.sql(
      "SELECT count(*) FROM ghp7.ev.ids WHERE id >= 150 AND id < 300")
    assert(q.head.getLong(0) == 150L)
    val scan = graftScan(spark.sql(
      "SELECT v FROM ghp7.ev.ids WHERE id >= 150 AND id < 300"))
    assert(scan.chosenFiles.nonEmpty && scan.chosenFiles.forall(r =>
      r.startsWith("id_trunc=100/") || r.startsWith("id_trunc=200/")),
      scan.chosenFiles.mkString(","))
    // string prefixes
    spark.sql("CREATE TABLE ghp7.ev.langs (s STRING, k BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (truncate(2, s))")
    spark.sql("INSERT INTO ghp7.ev.langs VALUES " +
      "('en-US', 1), ('en-GB', 2), ('de-DE', 3)")
    val q2 = spark.sql("SELECT k FROM ghp7.ev.langs WHERE s = 'de-DE'")
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(graftScan(q2).chosenFiles.forall(_.startsWith("s_trunc=de/")))
  }

  test("storage-partitioned join over HIDDEN bucket layouts: two bucket(8,id) tables join with ZERO shuffles") {
    register("ghp8")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp8.ev")
    for ((t, n) <- Seq(("a", 64), ("b", 40))) {
      spark.sql(s"CREATE TABLE ghp8.ev.$t (id BIGINT, v STRING) " +
        "USING `graft-manifest` PARTITIONED BY (bucket(8, id))")
      (0L until n.toLong).map(i => (i, s"$t$i")).toDF("id", "v")
        .createOrReplaceTempView(s"ghp8_src_$t")
      spark.sql(s"INSERT INTO ghp8.ev.$t SELECT * FROM ghp8_src_$t")
    }
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val here = p match {
          case _: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => 1
          case _ => 0
        }
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        here + kids.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    def joined() = spark.sql(
      "SELECT a.id, a.v AS va, b.v AS vb FROM ghp8.ev.a a " +
        "JOIN ghp8.ev.b b ON a.id = b.id")
    val expect = (0L until 40L).map(i => (i, s"a$i", s"b$i")).toSet
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = joined()
      assert(q.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet == expect)
      assert(shuffles(q) == 0,
        s"expected a shuffle-free SPJ over the hidden bucket layout:\n" +
          q.queryExecution.executedPlan)
      // ... and NOT the single-packed-partition degenerate: the scan
      // planned 8 KEY-GROUPED partitions per side, zipped bucket to
      // bucket (the output keeps one partition per bucket)
      assert(q.rdd.getNumPartitions == 8,
        s"expected 8 key-grouped partitions, got ${q.rdd.getNumPartitions}")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    // conf off (the default): same values; at THIS size the bin-packed
    // scans fit one partition each, so a shuffle-count control would be
    // vacuous (SinglePartition satisfies any clustering) — value
    // equality is the control
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q2 = joined()
      assert(q2.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet == expect)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("storage-partitioned join over the CALENDAR transform: two days(ts) tables join with ZERO shuffles, day zipped to day (round 20)") {
    register("ghp10")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp10.ev")
    for (t <- Seq("da", "db")) {
      spark.sql(s"CREATE TABLE ghp10.ev.$t (id BIGINT, v STRING, " +
        "ts TIMESTAMP) USING `graft-manifest` PARTITIONED BY (days(ts))")
      (0L until 60L).map(i => (i, s"${t.last}$i",
        java.sql.Timestamp.from(java.time.Instant.parse(
          f"2024-03-${10 + (i % 6).toInt}%02dT0${(i % 9).toInt}:15:00Z"))))
        .toDF("id", "v", "ts")
        .createOrReplaceTempView(s"ghp10_src_$t")
      spark.sql(s"INSERT INTO ghp10.ev.$t SELECT * FROM ghp10_src_$t")
    }
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val here = p match {
          case _: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => 1
          case _ => 0
        }
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        here + kids.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the join carries MORE keys than the layout (id AND ts) — day
    // grouping clusters ts only, so co-partitioning needs Spark's
    // relax-to-subset knob (each day zips whole; the residual id
    // equality evaluates inside the zipped partitions)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val q = spark.sql(
        "SELECT a.id, a.v AS va, b.v AS vb FROM ghp10.ev.da a " +
          "JOIN ghp10.ev.db b ON a.id = b.id AND a.ts = b.ts")
      val expect = (0L until 60L).map(i => (i, s"a$i", s"b$i")).toSet
      assert(q.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet == expect)
      assert(shuffles(q) == 0,
        s"expected a shuffle-free SPJ over the days(ts) layout:\n" +
          q.queryExecution.executedPlan)
      // day zipped to day, not the packed degenerate: 6 distinct days
      assert(q.rdd.getNumPartitions == 6,
        s"expected 6 key-grouped partitions, got ${q.rdd.getNumPartitions}")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
    }
  }

  test("partition-source RENAME (round 20): days(ts) source renames metadata-only; pre-rename leaves keep pruning; writes derive via the new name; identity sources still refuse") {
    register("ghp11")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp11.ev")
    spark.sql("CREATE TABLE ghp11.ev.rn (k BIGINT, ts TIMESTAMP) " +
      "USING `graft-manifest` PARTITIONED BY (days(ts))")
    def day(d: Int, h: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse(f"2024-06-$d%02dT$h%02d:00:00Z"))
    // generation 1 under the ORIGINAL name: days 01 and 02
    Seq((1L, day(1, 3)), (2L, day(2, 4))).toDF("k", "ts")
      .createOrReplaceTempView("ghp11_g1")
    spark.sql("INSERT INTO ghp11.ev.rn SELECT * FROM ghp11_g1")
    spark.sql("ALTER TABLE ghp11.ev.rn RENAME COLUMN ts TO event_ts")
    // the logical schema speaks the new name; the layout survives
    assert(spark.table("ghp11.ev.rn").schema.fieldNames.toSeq ==
      Seq("k", "event_ts"))
    // generation 2 under the NEW name: days 02 and 03 — the writer
    // derives the SAME physical ts_day level
    Seq((3L, day(2, 9)), (4L, day(3, 5))).toDF("k", "event_ts")
      .createOrReplaceTempView("ghp11_g2")
    spark.sql("INSERT INTO ghp11.ev.rn SELECT * FROM ghp11_g2")
    val root = s"$warehouse/ev/rn"
    val leaves = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("ts_day=")).sorted.toSeq
    assert(leaves == Seq("ts_day=2024-06-01", "ts_day=2024-06-02",
      "ts_day=2024-06-03"), leaves.toString)
    // a filter on the NEW name prunes to day 02 — BOTH generations' files
    val q = spark.sql("SELECT k FROM ghp11.ev.rn WHERE " +
      "event_ts >= TIMESTAMP'2024-06-02 00:00:00' AND " +
      "event_ts < TIMESTAMP'2024-06-03 00:00:00'")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    val scan = graftScan(q)
    assert(scan.chosenFiles.size == 2 &&
      scan.chosenFiles.forall(_.startsWith("ts_day=2024-06-02/")),
      scan.chosenFiles.toString)
    assert(scan.chosenFiles.size < scan.totalFiles)
    // time travel reads v0 under the name it had THEN
    val v0 = spark.read.format("graft-manifest").option("versionAsOf", "0")
      .load(root)
    assert(v0.schema.fieldNames.contains("ts") &&
      !v0.schema.fieldNames.contains("event_ts"))
    // an IDENTITY partition column still refuses (directory-only)
    spark.sql("CREATE TABLE ghp11.ev.idp (k BIGINT, lang STRING) " +
      "USING `graft-manifest` PARTITIONED BY (lang)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE ghp11.ev.idp RENAME COLUMN lang TO sprache")
    }
    assert(e.getMessage.contains("identity partition column"),
      e.getMessage)
  }

  test("the CDF read prunes derived day leaves too: a ts-filtered feed plans only the matching days' changed files") {
    register("ghp9")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp9.ev")
    spark.sql("CREATE TABLE ghp9.ev.t9 (k BIGINT, ts TIMESTAMP) " +
      "USING `graft-manifest` PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO ghp9.ev.t9 VALUES " +
      "(1, TIMESTAMP'2024-01-01 10:00:00')," +
      "(2, TIMESTAMP'2024-01-02 10:00:00')," +
      "(3, TIMESTAMP'2024-01-03 10:00:00')")
    spark.sql("INSERT INTO ghp9.ev.t9 VALUES " +
      "(4, TIMESTAMP'2024-01-02 11:00:00')," +
      "(5, TIMESTAMP'2024-01-04 11:00:00')")
    val root = s"$warehouse/ev/t9"
    val feed = spark.read.format("graft-manifest")
      .option("readChangeFeed", "true").load(root)
      .filter(col("ts") >= java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
        && col("ts") < java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
    assert(feed.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 4L))
    val scan = feed.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.isInstanceOf[GraftCdfScan] =>
        b.scan.asInstanceOf[GraftCdfScan]
    }.head
    val planned = scan.plannedPartitions.map(
      _.asInstanceOf[GraftCdfPartition])
    assert(planned.nonEmpty && planned.forall(_.files.forall(
      _._1.startsWith("ts_day=2024-01-02/"))),
      planned.flatMap(_.files.map(_._1)).mkString(","))
  }

  test("the STREAMING sink derives hidden layouts too; string bucket(4, s) hashes through xx64") {
    register("ghp10")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ghp10.ev")
    spark.sql("CREATE TABLE ghp10.ev.s10 (k BIGINT, ts TIMESTAMP) " +
      "USING `graft-manifest` PARTITIONED BY (days(ts))")
    val root = s"$warehouse/ev/s10"
    // stream two micro-batches through the native sink
    val src = tmpDir("ghp10_src")
    val ckpt = tmpDir("ghp10_ckpt")
    (0 until 8).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(f"2024-02-0${1 + i % 2}%d 08:00:00")))
      .toDF("k", "ts").write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema("k BIGINT, ts TIMESTAMP").parquet(src)
      .writeStream.format("graft-manifest")
      .option("path", root).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val leaves = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("ts_day=")).sorted
    assert(leaves.toSeq == Seq("ts_day=2024-02-01", "ts_day=2024-02-02"),
      leaves.mkString(","))
    assert(spark.sql("SELECT count(*) FROM ghp10.ev.s10")
      .head.getLong(0) == 8L)
    // string bucketing: the manifest's own xx64 hash family
    spark.sql("CREATE TABLE ghp10.ev.langs10 (s STRING, k BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(4, s))")
    spark.sql("INSERT INTO ghp10.ev.langs10 VALUES ('en', 1), ('de', 2)")
    val qb = spark.sql("SELECT k FROM ghp10.ev.langs10 WHERE s = 'de'")
    assert(qb.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val bk = PartitionTransforms.bucketOfString("de", 4)
    assert(graftScan(qb).chosenFiles.forall(
      _.startsWith(s"s_bucket=$bk/")))
  }

  test("the transform derivations: day boundaries, bucket spread, descriptor roundtrip") {
    // UTC day boundary: 23:59:59.999999 vs 00:00:00
    assert(PartitionTransforms.renderDay(PartitionTransforms
      .epochDayOfMicros(java.time.Instant.parse("2024-06-30T23:59:59.999999Z")
        .getEpochSecond * 1000000L + 999999L)) == "2024-06-30")
    assert(PartitionTransforms.renderDay(PartitionTransforms
      .epochDayOfMicros(java.time.Instant.parse("2024-07-01T00:00:00Z")
        .getEpochSecond * 1000000L)) == "2024-07-01")
    // pre-epoch floors correctly (floorDiv, not truncation)
    assert(PartitionTransforms.renderDay(PartitionTransforms
      .epochDayOfMicros(java.time.Instant.parse("1969-12-31T23:00:00Z")
        .getEpochSecond * 1000000L)) == "1969-12-31")
    // bucket spread: 1000 sequential longs spread over 16 buckets with
    // no empty bucket (the avalanche test — raw mod would stripe)
    val counts = (0L until 1000L)
      .groupBy(PartitionTransforms.bucketOfLong(_, 16)).view.mapValues(_.size)
    assert(counts.size == 16 && counts.values.min > 20, counts.toMap.toString)
    // month/year/hour/truncate unit arithmetic roundtrips
    import PartitionTransforms._
    val m = unitOfMicros(MonthsSpec("x"),
      java.time.Instant.parse("2024-03-15T10:00:00Z").getEpochSecond * 1000000L)
    assert(renderUnit(MonthsSpec("x"), m) == "2024-03")
    assert(parseUnitValue(MonthsSpec("x"), "2024-03").contains(m))
    val h = unitOfMicros(HoursSpec("x"),
      java.time.Instant.parse("2024-03-15T23:59:59Z").getEpochSecond * 1000000L)
    assert(renderUnit(HoursSpec("x"), h) == "2024-03-15-23")
    assert(parseUnitValue(HoursSpec("x"), "2024-03-15-23").contains(h))
    assert(truncLong(-150L, 100) == -200L) // floorDiv, not toward-zero
    // exclusive-upper month boundary: `< Apr 1` excludes April
    assert(filterUnitUpperExclusive(MonthsSpec("x"),
      java.sql.Timestamp.from(java.time.Instant.parse("2024-04-01T00:00:00Z")))
      .contains(m)) // April's start excludes April: reaches March (= m)
    // the transforms are USER-CALLABLE SQL functions through the catalog
    // (debugging which leaf a row lands in) — same arithmetic as the
    // writer's derivation
    register("ghp_fn")
    assert(spark.sql(
      "SELECT ghp_fn.system.days(TIMESTAMP'2024-03-15 10:00:00')")
      .head.getInt(0) == java.time.LocalDate.of(2024, 3, 15)
      .toEpochDay.toInt)
    assert(spark.sql(
      "SELECT ghp_fn.system.bucket(8, CAST(137 AS BIGINT))")
      .head.getInt(0) == PartitionTransforms.bucketOfLong(137L, 8))
    // spec strings roundtrip through the descriptor encoding
    val specs = Seq("part", "days(ts)", "bucket(16,id)",
      "months(ts)", "years(d)", "hours(ts)", "truncate(100,id)")
    assert(PartitionTransforms.splitSpecs(specs.mkString(","))
      .map(PartitionTransforms.parse).map(_.render) == specs)
    // level names
    assert(PartitionTransforms.parse("days(ts)").levelName == "ts_day")
    assert(PartitionTransforms.parse("bucket(4,id)").levelName == "id_bucket")
    assert(PartitionTransforms.parse("lang").isIdentity)
  }
}
