package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

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

  test("rollingActiveUsers: hand-checked trailing-7-day distinct counts on a tiny fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_micros
    // users: u1 active day 1; u1,u2 day 3; u2 day 10 (a gap > window)
    def ts(day: Int) = 1704067200000000L + day.toLong * 86400000000L // 2024-01-01 + day
    val ev = Seq(
      (ts(1), 1L), (ts(1), 1L), // same (day, user) twice: collapses
      (ts(3), 1L), (ts(3), 2L),
      (ts(10), 2L)
    ).toDF("us", "user_id").select(timestamp_micros(col("us")).as("ts"), col("user_id"))
    val out = Analytics.rollingActiveUsers(ev, days = 7).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // day 1: {u1}; day 3: {u1(d1), u1, u2} = {u1, u2}; day 10: window
    // [day 4, day 10] sees only u2 — day-3 activity has aged out.
    // (UTC session: epoch 2024-01-01 + N days.)
    assert(out == Map(
      "2024-01-02" -> 1L, "2024-01-04" -> 2L, "2024-01-11" -> 1L),
      s"unexpected rolling counts: $out")
    // only days WITH events appear — no phantom trailing days
    assert(out.size == 3)
  }

  test("KMV distinct sketch: exact under k, inside estimator error above k") {
    val ev = t("events")
    val exact = Analytics.distinctUsersPerType(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // under-k regime (15 distinct users per type at this sf, k=32): the
    // sketch holds every hash — estimate must be EXACT
    Analytics.kmvDistinctUsers(ev, k = 32).collect().foreach { r =>
      assert(r.getLong(1) < 32L)
      assert(r.getLong(2) == exact(r.getString(0)) * 1000,
        s"${r.getString(0)} under-k sketch must be exact")
    }
    // estimator regime (k=8 < 15): (k-1)/U(k), stderr ~ 1/sqrt(k-1) ≈ 38%
    val est = Analytics.kmvDistinctUsers(ev, k = 8).collect()
    assert(est.nonEmpty && est.forall(_.getLong(1) == 8L),
      "every group must reach the sketch cap in the estimator regime")
    est.foreach { r =>
      val ex = exact(r.getString(0))
      val rel = math.abs(r.getLong(2) / 1000.0 - ex) / ex
      assert(rel <= 0.55, s"${r.getString(0)}: ${r.getLong(2) / 1000.0} vs $ex (rel $rel)")
    }
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

  test("trailingRevenue: event-time frame (gaps shrink it), same-day peers share it") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    import spark.implicits._
    val day = 86400L
    val orders = Seq(
      (1L, 7L, 0L * day, 100.0),   // day 0
      (2L, 7L, 10L * day, 50.0),   // day 10: frame = {0, 10}
      (3L, 7L, 50L * day, 25.0),   // day 50: 30-day frame excludes 0 and 10
      (4L, 8L, 10L * day, 10.0),   // same-day peers: RANGE frame includes
      (5L, 8L, 10L * day, 20.0)    //   both rows in both frames
    ).toDF("o_orderkey", "o_custkey", "sec", "o_totalprice")
      .withColumn("o_orderdate", timestamp_seconds(col("sec"))).drop("sec")
    val out = Analytics.trailingRevenue(orders, days = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(
      1L -> 10000L, 2L -> 15000L, 3L -> 2500L,
      4L -> 3000L, 5L -> 3000L))
  }

  test("metadataStats: footer-pushed values equal a plain data-scan aggregate") {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val pushed = Analytics.metadataStats(spark, graft.core.Tables.path(sf, "lineitem"))
    val plain = t("lineitem").agg(
      count(lit(1)).as("cnt"),
      min(col("l_orderkey")).as("min_orderkey"),
      max(col("l_orderkey")).as("max_orderkey"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))
    assert(pushed.collect().toSeq == plain.collect().toSeq)
  }

  test("eventsHourly matches the oracle-gated e1 derivation exactly") {
    val a = Analytics.eventsHourly(t("events"))
    val b = graft.SparkEntry.queries("e1_events_hourly")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("stratifiedSample: exact ceil(n*p/100) rows per stratum, deterministic") {
    val docs = t("documents")
    val sampled = Analytics.stratifiedSample(docs, percent = 20).cache()
    val got = sampled.groupBy("lang", "source").count()
    val want = docs.groupBy("lang", "source").count()
      .withColumnRenamed("count", "n")
      .withColumn("want", expr("(n * 20 + 99) div 100"))
    val mismatch = got.join(want, Seq("lang", "source"))
      .filter(col("count") =!= col("want")).count()
    assert(mismatch == 0)
    assert(want.count() == got.count()) // every stratum represented
    // pure function of the data: a second evaluation picks the same rows
    val again = Analytics.stratifiedSample(docs, percent = 20)
    assert(sampled.exceptAll(again).isEmpty && again.exceptAll(sampled).isEmpty)
  }

  test("stratifiedSample: giant stratum — equals windowed truth, band is O(sqrt n), brackets hold") {
    // plant ONE corpus-wide stratum: the exact shape that serialized the old
    // stratum-wide window into a single sort task. 100k rows so the
    // concentration bound (not the small-n constant floor) is what's tested.
    val docs = spark.range(100000).select(
      col("id").as("doc_id"), lit("zz").as("lang"), lit("planted").as("source"))
    val n = docs.count()
    val fast = Analytics.stratifiedSample(docs, percent = 20)
    val truth = Analytics.stratifiedSampleWindowed(docs, percent = 20)
    assert(fast.exceptAll(truth).isEmpty && truth.exceptAll(fast).isEmpty,
      "two-pass selection diverges from the stratum-wide windowed truth")
    // replay the bracket math and pin (a) the audit held — the windowed
    // fallback never fired — and (b) the only window's input (the boundary
    // band) is O(sqrt n) of the stratum, not the stratum
    val R = 1152921504606846976L
    val m = (n * 20 + 99) / 100
    val mu = R.toDouble * m / (n + 1)
    val margin = R.toDouble * (8.0 * math.sqrt(m.toDouble) / n + 64.0 / n)
    val tLo = math.max(0.0, math.floor(mu - margin)).toLong
    val tHi = math.min(R.toDouble, math.ceil(mu + margin)).toLong
    val h = docs.selectExpr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h")
    val cLo = h.filter(col("h") < tLo).count()
    val cHi = h.filter(col("h") <= tHi).count()
    assert(cLo <= m && m <= cHi,
      s"hash brackets failed on real data: c_lo=$cLo m=$m c_hi=$cHi")
    val band = h.filter(col("h") >= tLo && col("h") <= tHi).count()
    val bound = (40.0 * math.sqrt(n.toDouble) + 130).toLong
    assert(band <= bound,
      s"boundary band $band rows exceeds O(sqrt n) bound $bound for n=$n")
    assert(band < n / 10, s"band $band is not small vs stratum $n")
  }

  test("stratifiedSample: percent edge cases (0 -> empty, 100 -> everything)") {
    val docs = t("documents")
    assert(Analytics.stratifiedSample(docs, percent = 0).count() == 0)
    assert(Analytics.stratifiedSample(docs, percent = 100).count() == docs.count())
  }

  test("runningRevenue: final cumulative value equals per-customer total") {
    val orders = t("orders")
    val last = Analytics.runningRevenue(orders)
      .groupBy("o_custkey").agg(max("cum_revenue_centi").as("cum"))
    val want = orders.groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("tot"))
    assert(last.join(want, "o_custkey")
      .filter(col("cum") =!= col("tot")).count() == 0)
    // row-per-order, and prefixes are non-decreasing (prices are positive)
    assert(Analytics.runningRevenue(orders).count() == orders.count())
  }

  test("orderGaps: first order per customer has null gap, gaps non-negative") {
    val out = Analytics.orderGaps(t("orders")).cache()
    val orders = t("orders")
    assert(out.count() == orders.count())
    // exactly one null-gap row (the first order) per customer
    val firsts = out.filter(col("prev_orderdate").isNull)
      .groupBy("o_custkey").count().filter(col("count") =!= 1).count()
    assert(firsts == 0)
    assert(out.filter(col("o_custkey").isNotNull).select("o_custkey").distinct().count() ==
      out.filter(col("prev_orderdate").isNull).count())
    // ascending order within customer => non-negative gaps
    assert(out.filter(col("gap_micros") < 0).count() == 0)
  }

  test("eventTypePivot: one row per user, cells sum back to the event count") {
    val events = t("events")
    val out = Analytics.eventTypePivot(events).cache()
    assert(out.count() == events.select("user_id").distinct().count())
    val cellSum = out.select(
      (col("click") + col("error") + col("purchase") + col("signup") + col("view"))
        .as("s")).agg(sum("s")).head().getLong(0)
    assert(cellSum == events.count())
  }

  test("propsExtract: k parsed from every JSON props, flag consistent") {
    val out = Analytics.propsExtract(t("events")).cache()
    assert(out.filter(col("k").isNull).count() == 0)
    assert(out.filter(
      (col("k") >= 50 && col("k_high") =!= 1) ||
      (col("k") < 50 && col("k_high") =!= 0)).count() == 0)
  }

  test("funnel: strict event-time ordering per stage, stalls keep nulls") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      // user 1 converts fully in order
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: purchase BEFORE the first view-then-click chain -> no step3
      (2L, ts(10), "purchase"), (2L, ts(20), "view"), (2L, ts(30), "click"),
      // user 3: click at the SAME instant as first view (not strictly after)
      (3L, ts(10), "view"), (3L, ts(10), "click"),
      // user 4: never views -> absent from the funnel
      (4L, ts(10), "click"), (4L, ts(20), "purchase"),
      // user 5: second click is the one after the view
      (5L, ts(5), "click"), (5L, ts(10), "view"), (5L, ts(15), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnel(ev).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    assert(out(1L) == ((Some(ts(10)), Some(ts(20)), Some(ts(30)))))
    assert(out(2L) == ((Some(ts(20)), Some(ts(30)), None)))
    assert(out(3L) == ((Some(ts(10)), None, None)))
    assert(out(5L) == ((Some(ts(10)), Some(ts(15)), None)))
  }

  test("orderGroupingSets: exactly the requested sets, totals consistent") {
    val out = Analytics.orderGroupingSets(t("orders")).collect()
    // gid 0 = (status, priority), 1 = (status), 3 = grand total — the
    // (priority)-only set (gid 2) a cube would add must NOT appear
    val byGid = out.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 3L), s"unexpected sets: ${byGid.keySet}")
    assert(byGid(3L).length == 1, "grand total must be a single row")
    val total = byGid(3L).head.getAs[Long]("n")
    assert(byGid(0L).map(_.getAs[Long]("n")).sum == total, "detail rows don't sum to total")
    assert(byGid(1L).map(_.getAs[Long]("n")).sum == total, "status subtotals don't sum to total")
    assert(byGid(1L).forall(_.isNullAt(1)), "status subtotal rows must null the priority")
  }

  test("histogramQuantiles: estimates bracket the exact quantiles within one bucket width") {
    val orders = t("orders")
    val out = Analytics.histogramQuantiles(orders, "o_totalprice", "o_orderstatus").cache()
    val nGroups = orders.select("o_orderstatus").distinct().count()
    assert(out.count() == nGroups * 3, "expected groups x quantiles rows")
    // right-edge estimate brackets the exact ceil(q*n)-th order statistic
    // within one bucket width (test-scale driver check)
    val mm = orders.agg(min("o_totalprice"), max("o_totalprice")).head()
    val width = (mm.getDouble(1) - mm.getDouble(0)) / 256.0
    val sortedByStatus = orders.select("o_orderstatus", "o_totalprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    out.collect().foreach { r =>
      val vs = sortedByStatus(r.getString(0))
      val k = ((vs.length.toLong * r.getAs[Int]("q_milli") + 999) / 1000).toInt
      val exact = vs(k - 1)
      val est = r.getAs[Long]("est_centi") / 100.0
      assert(est >= exact - 0.01 && est <= exact + width + 0.01,
        s"estimate $est outside [$exact, $exact + $width] for ${r.get(0)}/${r.get(1)}")
    }
    // the histogram is mergeable by addition: quantiles from two disjoint
    // halves' summed histograms equal the single-pass answer — here pinned
    // end-to-end: running the operator on a reshuffled input changes nothing
    val again = Analytics.histogramQuantiles(
      orders.repartition(7), "o_totalprice", "o_orderstatus")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }
}
