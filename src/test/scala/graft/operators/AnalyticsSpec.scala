package graft.operators

import graft.SparkSpec
import graft.core.Tables

/** Analytics layer — correctness sanity + the plan shapes that matter at
  * scale (partial aggregation, broadcast dims, TakeOrderedAndProject top-k,
  * semi/anti join selection).
  */
class AnalyticsSpec extends SparkSpec {

  private def t(name: String) = Tables.load(spark, sf, name)

  test("pricingSummary: partial (map-side) aggregation in the plan, bounded groups") {
    val df = Analytics.pricingSummary(t("lineitem"))
    val plan = df.queryExecution.executedPlan.toString
    // partial + final HashAggregate pair = map-side combine before shuffle
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 6) // |returnflag| x |linestatus|
  }

  test("revenueByNation: nation dim is broadcast, never shuffled") {
    val df = Analytics.revenueByNation(t("customer"), t("orders"), t("nation"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"nation not broadcast:\n$plan")
    assert(df.count() == 25)
  }

  test("topKOrders plans as TakeOrderedAndProject, not a global sort") {
    val df = Analytics.topKOrders(t("orders"), k = 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort instead of top-k:\n$plan")
    val prices = df.collect().map(_.getDouble(2))
    assert(prices.length == 10 && prices.sameElements(prices.sortBy(-_)))
  }

  test("topOrdersPerCustomer: at most n per customer, deterministic ties") {
    val df = Analytics.topOrdersPerCustomer(t("orders"), n = 3)
    val maxPer = df.groupBy("o_custkey").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxPer <= 3)
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti and partition the customers") {
    val semi = Analytics.customersWithBigOrders(t("customer"), t("orders"), 300000)
    val anti = Analytics.customersWithoutBigOrders(t("customer"), t("orders"), 300000)
    assert(semi.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(anti.queryExecution.executedPlan.toString.contains("LeftAnti"))
    val total = t("customer").count()
    assert(semi.count() + anti.count() == total) // exact partition of customers
  }

  test("set ops: except/intersect partition the distinct nation keys") {
    val only = Analytics.customerOnlyNations(t("customer"), t("supplier"))
    val both = Analytics.activeNations(t("customer"), t("supplier"))
    val allCust = t("customer").select("c_nationkey").distinct().count()
    assert(only.count() + both.count() == allCust)
  }

  test("orderStatsRollup: rollup emits detail + status subtotals + grand total") {
    val df = Analytics.orderStatsRollup(t("orders"))
    val orders = t("orders")
    val detail = orders.select("o_orderstatus", "o_orderpriority").distinct().count()
    val statuses = orders.select("o_orderstatus").distinct().count()
    assert(df.count() == detail + statuses + 1)
  }

  test("eventsHourly matches the oracle-gated e1 derivation exactly") {
    val a = Analytics.eventsHourly(t("events"))
    val b = graft.SparkEntry.queries("e1_events_hourly")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
