package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableStatsSpec extends SparkSpec {

  test("columnStats: under-k table is exact (counts, range, NDV) with zero nulls") {
    val r = TableStats.columnStats(spark, sf, "region", "r_regionkey").collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "region" && row.getString(1) == "r_regionkey")
    val nRows = row.getLong(2)
    assert(nRows == 5, s"region should have 5 rows, stats say $nRows")
    assert(row.getLong(3) == 0, "key column reported nulls")
    assert(row.getLong(4) == 0 && row.getLong(5) == 4,
      s"region key range should be [0, 4], got [${row.getLong(4)}, ${row.getLong(5)}]")
    // 5 distinct < k=32: the sketch holds every value — exact by definition
    assert(row.getLong(6) == 5000L, s"under-k NDV must be exact*1000, got ${row.getLong(6)}")
  }

  test("sketch merge: two halves merged equal the direct full-table sketch exactly") {
    val orders = graft.core.Tables.load(spark, sf, "orders")
    val direct = TableStats.finalizeStats(
      TableStats.mergeSketches(TableStats.sketch(orders, "orders", "o_orderkey")))
    val halves = Seq(0, 1).map(h =>
      TableStats.sketch(
        orders.filter(pmod(col("o_orderkey"), lit(2)) === h), "orders", "o_orderkey"))
    val merged = TableStats.finalizeStats(
      TableStats.mergeSketches(halves.reduce(_.unionByName(_))))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "merged half-sketches disagree with the direct full-table sketch")
    // order-insensitive: reversed merge order gives the identical result
    val reversed = TableStats.finalizeStats(
      TableStats.mergeSketches(halves.reverse.reduce(_.unionByName(_))))
    assert(merged.exceptAll(reversed).isEmpty && reversed.exceptAll(merged).isEmpty)
    // empty-slice identity: merging in a sketch of zero rows changes nothing
    val withEmpty = TableStats.finalizeStats(TableStats.mergeSketches(
      halves.reduce(_.unionByName(_))
        .unionByName(TableStats.sketch(
          orders.filter(lit(false)), "orders", "o_orderkey"))))
    assert(merged.exceptAll(withEmpty).isEmpty && withEmpty.exceptAll(merged).isEmpty,
      "empty sketch is not a merge identity")
  }

  test("tableSketch: C columns of one table ride ONE scan, values agree with per-column sketches") {
    val df = TableStats.tableSketch(spark, sf, "orders",
      Seq("o_orderkey", "o_custkey", "o_totalprice"))
    // the 100× claim: the executed plan reads the orders parquet ONCE — the
    // old shape was one distinct→sort→limit data pass PER column
    val plan = df.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).length +
      "BatchScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 scan of orders, got $scans\n$plan")
    // and each exploded row equals the independent single-column sketch
    val orders = graft.core.Tables.load(spark, sf, "orders")
    for (c <- Seq("o_orderkey", "o_custkey", "o_totalprice")) {
      val one = df.filter(col("column_name") === c)
      val ref = TableStats.sketch(orders, "orders", c)
      assert(one.exceptAll(ref).isEmpty && ref.exceptAll(one).isEmpty,
        s"tableSketch disagrees with sketch on $c")
    }
  }

  test("columnStats: KMV NDV estimate lands near the exact distinct count on a key column") {
    val r = TableStats.columnStats(spark, sf, "orders", "o_orderkey").collect()(0)
    val exact = graft.core.Tables.load(spark, sf, "orders")
      .select("o_orderkey").distinct().count()
    assert(r.getLong(2) >= exact, "row count below distinct count")
    val est = r.getLong(6) / 1000.0
    // k=32 → relative std ≈ 1/sqrt(30) ≈ 18%; 3σ bound with slack
    assert(est > exact * 0.4 && est < exact * 2.5,
      s"KMV estimate $est implausibly far from exact $exact")
  }

  test("analyze persists one row per (table, column); statsRelation exposes it to SQL") {
    val out = tmpDir("graft_stats_spec") + "/stats"
    TableStats.analyze(spark, sf, out)
    val rel = TableStats.statsRelation(spark, out)
    assert(rel.count() == TableStats.statColumns.size.toLong)
    assert(rel.select("table_name").distinct().count() ==
      TableStats.statColumns.size.toLong)
    // the catalog relation answers SQL — the CBO-input / pipeline-gate use
    val viaSql = spark.sql(
      s"SELECT n_rows FROM ${TableStats.ViewName} WHERE table_name = 'lineitem'")
      .collect()(0).getLong(0)
    val exact = graft.core.Tables.load(spark, sf, "lineitem").count()
    assert(viaSql == exact, s"persisted lineitem n_rows $viaSql != $exact")
    // every stats row is internally consistent: no nulls in keys, min <= max,
    // NDV estimate positive and <= n_rows is NOT guaranteed (estimator
    // variance) but must be positive and finite
    val bad = rel.filter(
      col("n_nulls") =!= 0 || col("min_key") > col("max_key") ||
        col("ndv_milli") <= 0).count()
    assert(bad == 0, "inconsistent stats row")
    // a re-run is a full refresh, not an append
    TableStats.analyze(spark, sf, out)
    assert(spark.read.parquet(out).count() == TableStats.statColumns.size.toLong)
  }

  test("CBO wiring: ANALYZE TABLE + cbo.enabled surface rowCount to the optimizer, agreeing with a25") {
    // the stats a25 persists are the same numbers Catalyst's cost-based
    // optimizer consumes from the metastore — demonstrate the native path
    // end-to-end: managed table -> ANALYZE -> optimizer sees the row count
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      graft.core.Tables.load(spark, sf, "region")
        .write.mode("overwrite").saveAsTable("graft_cbo_region")
      spark.sql("ANALYZE TABLE graft_cbo_region COMPUTE STATISTICS")
      val rc = spark.table("graft_cbo_region")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(rc.isDefined, "optimizer sees no rowCount after ANALYZE with CBO on")
      val a25 = TableStats.columnStats(spark, sf, "region", "r_regionkey")
        .collect()(0).getLong(2)
      assert(rc.get == BigInt(a25),
        s"catalog rowCount ${rc.get} disagrees with a25 n_rows $a25")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cbo_region")
      spark.conf.set("spark.sql.cbo.enabled", prev)
    }
  }

  test("count/min/max ride the footer-only pushdown scan (A22's shape)") {
    val df = TableStats.columnStats(spark, sf, "orders", "o_orderkey")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = p.linesIterator.filter(_.contains("PushedAggregation")).mkString
    assert(pushed.contains("COUNT(*)") && pushed.contains("MIN(o_orderkey)") &&
      pushed.contains("MAX(o_orderkey)"),
      s"stats aggregate not pushed into the parquet scan:\n$p")
  }
}
