package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsPlannerSpec extends SparkSpec {

  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def writeStats(path: String, rows: Seq[(String, String, Long, Long)]): Unit =
    rows.map { case (t, c, n, ndv) => (t, c, n, 0L, 0L, n - 1, ndv * 1000L) }
      .toDF("table_name", "column_name", "n_rows", "n_nulls",
        "min_key", "max_key", "ndv_milli")
      .coalesce(1).write.mode("overwrite").parquet(path)

  test("statsJoin: the broadcast build side FLIPS when the artifact flips which table is small") {
    val nation = graft.core.Tables.load(spark, sf, "nation")
    val customer = graft.core.Tables.load(spark, sf, "customer")
    val cond = customer("c_nationkey") === nation("n_nationkey")
    // artifact A: nation is tiny, customer is huge -> broadcast RIGHT (nation)
    val a = tmpDir("graft_statsplan_a") + "/stats"
    writeStats(a, Seq(
      ("customer", "c_custkey", 5000000000L, 5000000000L),
      ("nation", "n_nationkey", 25L, 25L)))
    val planA = plan(StatsPlanner.statsJoin(
      spark, a, customer, "customer", nation, "nation", cond))
    assert(planA.contains("BroadcastHashJoin") && planA.contains("BuildRight"),
      s"expected BuildRight broadcast of nation:\n$planA")
    // artifact B: the SAME code, but stats now claim customer is the small
    // side -> the build side must flip to LEFT (customer)
    val b = tmpDir("graft_statsplan_b") + "/stats"
    writeStats(b, Seq(
      ("customer", "c_custkey", 30L, 30L),
      ("nation", "n_nationkey", 9000000000L, 9000000000L)))
    val planB = plan(StatsPlanner.statsJoin(
      spark, b, customer, "customer", nation, "nation", cond))
    assert(planB.contains("BroadcastHashJoin") && planB.contains("BuildLeft"),
      s"expected BuildLeft broadcast of customer:\n$planB")
    // values are decision-invariant: both plans produce the same rows
    val outA = StatsPlanner.statsJoin(
      spark, a, customer, "customer", nation, "nation", cond)
      .select("c_custkey", "n_name")
    val outB = StatsPlanner.statsJoin(
      spark, b, customer, "customer", nation, "nation", cond)
      .select("c_custkey", "n_name")
    assert(outA.exceptAll(outB).isEmpty && outB.exceptAll(outA).isEmpty)
  }

  test("statsJoin: neither side under the ceiling (or missing stats) -> no broadcast hint") {
    val nation = graft.core.Tables.load(spark, sf, "nation")
    val customer = graft.core.Tables.load(spark, sf, "customer")
    val cond = customer("c_nationkey") === nation("n_nationkey")
    val p = tmpDir("graft_statsplan_big") + "/stats"
    writeStats(p, Seq(
      ("customer", "c_custkey", 5000000000L, 5000000000L),
      ("nation", "n_nationkey", 7000000000L, 7000000000L)))
    // with AQE's own size estimates disabled from interfering, the logical
    // plan must carry NO broadcast hint when stats say both sides are huge
    val joined = StatsPlanner.statsJoin(
      spark, p, customer, "customer", nation, "nation", cond)
    val logical = joined.queryExecution.optimizedPlan.toString
    assert(!logical.contains("ResolvedHint") && !logical.contains("broadcast"),
      s"no-stats-qualify join must not hint a broadcast:\n$logical")
  }

  test("statsJoin: WIDE-row flip — byte evidence vetoes a broadcast the row count would approve") {
    // wide: FEW rows but ~15 MB of fat strings (over the 10 MB byte
    // ceiling); thin: MORE rows, well under both ceilings. A row-count
    // planner broadcasts wide (800 < 5000 rows, both under 100k) — the
    // 100 TB mistake: shipping megabytes per executor because the row
    // count looked small. The byte-aware planner must flip to thin.
    val fixtures = tmpDir("graft_statsplan_wide")
    val fat = "x" * 20000
    spark.range(800)
      .selectExpr("id", s"concat('$fat', CAST(id AS STRING)) AS payload")
      .coalesce(1).write.mode("overwrite")
      .option("compression", "uncompressed")
      .parquet(s"$fixtures/wide.parquet")
    spark.range(5000).selectExpr("id AS id", "id * 2 AS v")
      .coalesce(1).write.mode("overwrite").parquet(s"$fixtures/thin.parquet")
    val out = tmpDir("graft_statsplan_wide_stats") + "/stats"
    TableStats.analyze(spark, fixtures, out,
      tables = Seq("wide" -> "id", "thin" -> "id"))
    assert(StatsPlanner.estimatedBytes(spark, out, "wide")
      .exists(_ > 10L * 1024 * 1024), "fixture not over the byte ceiling")
    assert(StatsPlanner.estimatedBytes(spark, out, "thin")
      .exists(_ < 10L * 1024 * 1024))
    val wide = spark.read.parquet(s"$fixtures/wide.parquet")
    val thin = spark.read.parquet(s"$fixtures/thin.parquet")
    val joined = StatsPlanner.statsJoin(
      spark, out, wide, "wide", thin, "thin", wide("id") === thin("id"))
    val p = plan(joined)
    // thin (the row-count LOSER) is the broadcast side; wide is vetoed
    assert(p.contains("BroadcastHashJoin") && p.contains("BuildRight"),
      s"byte evidence must flip the build side to thin:\n$p")
    // a pre-byte artifact (no total_bytes column) falls back to rows:
    // wide's 800 rows win the build side again — additive compatibility
    val legacy = tmpDir("graft_statsplan_wide_legacy") + "/stats"
    writeStats(legacy, Seq(("wide", "id", 800L, 800L),
      ("thin", "id", 5000L, 5000L)))
    assert(StatsPlanner.estimatedBytes(spark, legacy, "wide").isEmpty)
    val legacyPlan = plan(StatsPlanner.statsJoin(
      spark, legacy, wide, "wide", thin, "thin", wide("id") === thin("id")))
    assert(legacyPlan.contains("BuildLeft"),
      s"row fallback must keep the legacy decision:\n$legacyPlan")
  }

  test("statsJoin wired end-to-end: a real ANALYZE artifact drives a dimension broadcast") {
    // the full loop: ANALYZE the actual tables -> artifact -> join planning
    val out = tmpDir("graft_statsplan_real") + "/stats"
    TableStats.analyze(spark, sf, out)
    val nation = graft.core.Tables.load(spark, sf, "nation")
    val customer = graft.core.Tables.load(spark, sf, "customer")
    val joined = StatsPlanner.statsJoin(
      spark, out, customer, "customer", nation, "nation",
      customer("c_nationkey") === nation("n_nationkey"))
    // real sf stats: nation (25 rows) is the broadcast side
    val p = plan(joined)
    assert(p.contains("BroadcastHashJoin") && p.contains("BuildRight"),
      s"ANALYZE-driven plan did not broadcast the nation dim:\n$p")
    assert(StatsPlanner.estimatedRows(spark, out, "nation").contains(25L))
    assert(StatsPlanner.estimatedRows(spark, out, "zz_missing").isEmpty)
  }

  test("orderedJoin: stats put the small dim before the big fact; result invariant") {
    val out = tmpDir("graft_statsplan_order") + "/stats"
    TableStats.analyze(spark, sf, out)
    val customer = graft.core.Tables.load(spark, sf, "customer")
    val nation = graft.core.Tables.load(spark, sf, "nation")
    val orders = graft.core.Tables.load(spark, sf, "orders")
    // star on customer: nation (25 rows) and orders (the fact) — stats must
    // join nation FIRST (broadcast) and orders last (no broadcast), even
    // though the caller listed them the other way round
    val joined = StatsPlanner.orderedJoin(
      spark, out,
      Seq(
        ("orders", orders, col("o_custkey") === col("c_custkey")),
        ("nation", nation, col("c_nationkey") === col("n_nationkey"))),
      customer)
    val p = plan(joined)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1,
      s"the nation dim should broadcast from stats:\n$p")
    // the logical join order: nation's condition sits in the INNER join
    // (applied first), orders' in the outer — assert via the optimized
    // plan's join nesting (the inner join's condition string appears after
    // the outer's in the plan tree print)
    val logical = joined.queryExecution.analyzed.toString
    val inner = logical.indexOf("c_nationkey")
    val outer = logical.indexOf("o_custkey")
    assert(inner > outer && inner >= 0 && outer >= 0,
      s"nation join should nest inside (before) the orders join:\n$logical")
    val want = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
    assert(joined.selectExpr("c_custkey", "n_name", "o_orderkey")
      .exceptAll(want.selectExpr("c_custkey", "n_name", "o_orderkey")).isEmpty)
  }
}
