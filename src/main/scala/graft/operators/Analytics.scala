package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics — the operator classes the reference lacks entirely
  * (SURVEY.md §2.2 "explicitly absent": aggregation, windows, sort/limit, set
  * ops, subqueries). Added as north-star extensions, each designed to stay
  * shuffle-efficient at the 100 TB design point:
  *
  *  - group-bys rely on partial (map-side) aggregation, which Spark applies
  *    automatically to all algebraic aggregates used here;
  *  - dimension joins are broadcast explicitly so the fact table never
  *    shuffles for them;
  *  - top-k uses sort-limit (TakeOrderedAndProject), never a global sort;
  *  - window functions partition on high-cardinality keys so state stays
  *    bounded per task.
  */
object Analytics {

  private def round2(c: Column): Column = round(c, 2)

  /** TPC-H Q1-shaped pricing summary: 4-column algebraic aggregate over the
    * fact table. One shuffle on (returnflag, linestatus) — cardinality 6 —
    * after map-side partial agg reduces each task to ≤6 rows.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "1998-09-02"): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round2(sum("l_quantity")).as("sum_qty"),
        round2(sum("l_extendedprice")).as("sum_base_price"),
        round2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Revenue per nation: fact ⋈ dims. `nation` is broadcast (bounded-size
    * dimension); customer⋈orders shuffles once on the join key and the
    * aggregation reuses that partitioning.
    */
  def revenueByNation(customer: DataFrame, orders: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round2(sum("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))

  /** Top-N orders per customer by price — row_number window partitioned on
    * the (high-cardinality) customer key; ties broken on o_orderkey so the
    * result is deterministic.
    */
  def topOrdersPerCustomer(orders: DataFrame, n: Int = 3): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      // long for cross-engine schema parity (ANSI row_number is BIGINT)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  /** Global top-k: planned as TakeOrderedAndProject (per-partition heap +
    * driver merge of k rows), NOT a global sort — the only scalable shape
    * for ORDER BY … LIMIT k.
    */
  def topKOrders(orders: DataFrame, k: Int = 10): DataFrame =
    orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  def distinctSegments(customer: DataFrame): DataFrame =
    customer.select("c_mktsegment").distinct()

  /** Set ops (EXCEPT/INTERSECT are distinct-semantics in both Spark and
    * ANSI/DuckDB). Nation keys present among customers but not suppliers.
    */
  def customerOnlyNations(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nationkey"))
      .except(supplier.select(col("s_nationkey").as("nationkey")))

  def activeNations(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nationkey"))
      .intersect(supplier.select(col("s_nationkey").as("nationkey")))

  /** Semi/anti joins — the distributed form of IN / NOT EXISTS subqueries.
    * The filtered build side is small, so Catalyst broadcasts it and the
    * probe side never shuffles.
    */
  def customersWithBigOrders(customer: DataFrame, orders: DataFrame, minTotal: Double): DataFrame =
    customer
      .join(
        orders.filter(col("o_totalprice") > minTotal),
        customer("c_custkey") === orders("o_custkey"),
        "left_semi")
      .select("c_custkey", "c_name")

  def customersWithoutBigOrders(customer: DataFrame, orders: DataFrame, minTotal: Double): DataFrame =
    customer
      .join(
        orders.filter(col("o_totalprice") > minTotal),
        customer("c_custkey") === orders("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")

  /** ROLLUP over (status, priority): grouping sets evaluated in one pass. */
  def orderStatsRollup(orders: DataFrame): DataFrame =
    orders
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round2(sum("o_totalprice")).as("total"))

  /** CUBE over (status, priority): all 2^k grouping sets in one pass. */
  def orderStatsCube(orders: DataFrame): DataFrame =
    orders
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round2(sum("o_totalprice")).as("total"))

  /** Distinct aggregate (absent from the reference entirely): exact distinct
    * users per event type. Spark plans this as a two-phase expand+agg; for
    * approximate at extreme scale swap in approx_count_distinct (HLL) — not
    * oracle-gated here because sketches differ across engines.
    */
  def distinctUsersPerType(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))

  /** KMV (k-minimum-values) approximate-distinct sketch — the
    * oracle-gateable sketch: unlike HLL (whose hash and bias correction are
    * engine-private, see [[distinctUsersPerType]]'s note), KMV over md5 is
    * bit-deterministic in any engine, so the ESTIMATE itself hash-matches
    * DuckDB. Estimator (Bar-Yossef et al.): the k-th smallest of n uniform
    * hashes sits at ≈ k/(n+1) of the hash space, so n̂ = (k−1)/U(k) with
    * U(k) = the k-th smallest hash as a fraction of the space (first 15 md5
    * hex digits → integer / 16¹⁵; double math on exact integers, floor
    * milli-quantized). A group with fewer than k distinct hashes is exact
    * by definition — the sketch holds every value.
    *
    * Scale shape: the sketch is what makes distinct counting cheap at
    * 100 TB — fixed k values per group, mergeable by union+truncate
    * (partial aggregation). This formulation exercises the estimator
    * through a distinct + per-group top-k-min (window over the tiny
    * distinct-hash relation); a production build would carry the k minima
    * in a typed aggregation buffer — same estimate, same merge algebra.
    */
  def kmvDistinctUsers(events: DataFrame, k: Int = 32): DataFrame = {
    // 16^15 = 2^60 — the hash space of 15 md5 hex digits, exact as a double;
    // spelled as an integer literal so both engines derive the identical
    // double, and the a*b/c*d chain is left-associative in both SQL dialects
    val est = s"CAST(floor(${k - 1}.0D * CAST(1152921504606846976L AS DOUBLE) / " +
      "CAST(CAST(conv(substring(hk, 1, 15), 16, 10) AS BIGINT) AS DOUBLE) " +
      "* 1000.0D) AS BIGINT)"
    events
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= k)
      .groupBy("event_type")
      .agg(count(lit(1)).as("sketch_k"), max(col("h")).as("hk"))
      .select(
        col("event_type"), col("sketch_k"),
        when(col("sketch_k") < k, col("sketch_k") * 1000L)
          .otherwise(expr(est))
          .as("est_milli"))
  }

  /** Exact percentiles per group (ANSI interpolated definition — Spark's
    * `percentile` and DuckDB's `quantile_cont` share it). Exact sort-based;
    * swap for approx_percentile (t-digest/KLL) when the per-group data no
    * longer fits the exact path at scale — sketches aren't oracle-gated
    * here because implementations differ across engines.
    */
  def priceQuantiles(orders: DataFrame): DataFrame =
    orders
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))

  /** Batch tumbling-window aggregate over the events table (hourly). The
    * streaming twin is [[graft.streaming.EventsStream.hourlyAvailableNow]];
    * both produce this exact frame. `value` is quantized per-row to
    * milli-units BEFORE summing so the aggregate is exact integer math in
    * every engine (no float-sum ordering sensitivity).
    */
  def eventsHourly(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))

  /** Exact deterministic stratified sample: from every stratum, keep the
    * first m = ⌈n·percent/100⌉ rows in (md5(id), id) order. Hash order makes
    * the selection a pure function of the data (re-runs, engines and cluster
    * layouts agree — no RNG state), with EXACT per-stratum counts, which
    * per-row Bernoulli sampling can't give.
    *
    * Scale shape — two passes, NO stratum-wide sort anywhere:
    *  1. per-stratum count agg → m, plus hash thresholds [t_lo, t_hi]
    *     bracketing the m-th order statistic of the (uniform) 60-bit hash
    *     prefix with an 8σ + constant margin;
    *  2. map-only classification against the broadcast stats: rows with
    *     hash < t_lo are DEFINITELY in the sample (they precede the m-th
    *     row), rows past t_hi are definitely out, and only the narrow
    *     BOUNDARY BAND — O(√n) rows per stratum by order-statistic
    *     concentration, vs the stratum's n — is ranked to fill the exact
    *     remainder m − |definite|. The old formulation ranked ENTIRE strata
    *     (`row_number` over the strata partition), serializing a
    *     corpus-scale stratum into one sort task; here that window sees
    *     only the band.
    *
    * The brackets are chance-constrained, so exactness is GUARDED, not
    * assumed: one bounded driver-side check (per-stratum counts only)
    * verifies |h < t_lo| ≤ m ≤ |h ≤ t_hi|; a stratum that defies its
    * brackets (adversarial non-uniform ids) falls back to the windowed
    * selection FOR THAT STRATUM alone. On real data the band check is the
    * plan; the fallback never fires (spec-pinned).
    */
  def stratifiedSample(
      df: DataFrame,
      strataCols: Seq[String] = Seq("lang", "source"),
      percent: Int = 20,
      idCol: String = "doc_id"): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    val R = 1152921504606846976L // 2^60: the 15-hex-digit hash prefix space
    val keep = col(idCol) +: strataCols.map(col)
    // 60-bit prefix of the ordering hash: ORDER BY (md5, id) is identical
    // to ORDER BY (__h, md5, id) because __h is a monotone function (string
    // prefix) of md5 — so h-thresholds select PREFIXES of the true order.
    val withH = df
      .withColumn("__md5", md5(col(idCol).cast("string")))
      .withColumn("__h",
        expr("CAST(conv(substring(__md5, 1, 15), 16, 10) AS BIGINT)"))
    // pass 1: stratum sizes, targets, and hash brackets. m-th smallest of n
    // uniform draws over [0,R) concentrates at R·m/(n+1) with σ ≈ R·√m/n;
    // the +64/n constant floors the margin so tiny strata bracket the whole
    // range (their band IS the stratum — trivially correct and trivially
    // small). All double math here only PLACES the brackets; selection
    // stays exact integer logic, so FP rounding cannot change results.
    val stats = withH.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__m", expr(s"(__n * $percent + 99) div 100"))
      .withColumn("__mu", expr(s"CAST($R AS DOUBLE) * __m / (__n + 1)"))
      .withColumn("__margin",
        expr(s"CAST($R AS DOUBLE) * (8.0D * sqrt(CAST(__m AS DOUBLE)) / __n + 64.0D / __n)"))
      .withColumn("__t_lo",
        expr(s"CAST(greatest(0.0D, floor(__mu - __margin)) AS BIGINT)"))
      .withColumn("__t_hi",
        expr(s"CAST(least(CAST($R AS DOUBLE), ceil(__mu + __margin)) AS BIGINT)"))
      .select(strataCols.map(col) :+ col("__n") :+ col("__m") :+
        col("__t_lo") :+ col("__t_hi"): _*)
    // null-safe equi-join (<=>): a null stratum value is its own group,
    // exactly as a window PARTITION BY treats it
    def nullSafeJoin(left: DataFrame, right: DataFrame): DataFrame = {
      val renamed = strataCols.foldLeft(right)((d, c) =>
        d.withColumnRenamed(c, s"__r_$c"))
      left.join(broadcast(renamed),
          strataCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _))
        .drop(strataCols.map(c => s"__r_$c"): _*)
    }
    // materialized ONCE (eager localCheckpoint, the d2/d7 memo pattern):
    // the audit, definite-keep, remainder-count and band passes below all
    // re-read this frame — without the checkpoint each pass re-scans the
    // source, re-md5s and re-joins (round 9 measured 3× the runtime on
    // recompute alone). Pruned to the sample/selection columns FIRST: a
    // checkpoint materializes rows as-is, and the payload columns the
    // output never carries (e.g. documents.text) must not ride along —
    // the lazy plan pruned them at the scan, so the checkpoint must too.
    val tagged = nullSafeJoin(
        withH.select(keep :+ col("__md5") :+ col("__h"): _*), stats)
      .localCheckpoint(true)
    // bracket audit — per-stratum counts only (bounded by #strata): a
    // stratum is SAFE iff |h < t_lo| ≤ m ≤ |h ≤ t_hi|
    val audit = tagged.groupBy(strataCols.map(col): _*)
      .agg(
        sum(when(col("__h") < col("__t_lo"), 1L).otherwise(0L)).as("__c_lo"),
        sum(when(col("__h") <= col("__t_hi"), 1L).otherwise(0L)).as("__c_hi"),
        first(col("__m")).as("__m"))
    val unsafe = audit
      .filter(col("__c_lo") > col("__m") || col("__c_hi") < col("__m"))
      .select(strataCols.map(col): _*).collect() // ≤ #strata rows, ~always 0
    val isUnsafe: Column =
      if (unsafe.isEmpty) lit(false)
      else unsafe.map(r => strataCols.zipWithIndex
          .map { case (c, i) => col(c) <=> lit(r.get(i)) }.reduce(_ && _))
        .reduce(_ || _)
    val safe = tagged.filter(!isUnsafe)
    // definite keeps: strictly below the lower bracket — they precede the
    // m-th row of their stratum in (md5, id) order by construction
    val definite = safe.filter(col("__h") < col("__t_lo"))
    val cLo = definite.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("__c_lo"))
    // boundary band: ranked by the true order, fills the exact remainder.
    // This is the ONLY window, and it sees O(√n) rows per stratum.
    val bandOrd = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("__md5"), col(idCol))
    val cLoRenamed = strataCols.foldLeft(cLo)((d, c) =>
      d.withColumnRenamed(c, s"__r_$c"))
    val band = safe
      .filter(col("__h") >= col("__t_lo") && col("__h") <= col("__t_hi"))
      .join(broadcast(cLoRenamed),
        strataCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _), "left")
      .drop(strataCols.map(c => s"__r_$c"): _*)
      .na.fill(0L, Seq("__c_lo"))
      .withColumn("__rn", row_number().over(bandOrd).cast("long"))
      .filter(col("__rn") <= col("__m") - col("__c_lo"))
    val fast = definite.select(keep: _*).unionByName(band.select(keep: _*))
    if (unsafe.isEmpty) fast
    else fast.unionByName(
      stratifiedSampleWindowed(df.filter(isUnsafe), strataCols, percent, idCol))
  }

  /** The stratum-wide windowed selection — exact but serializes each
    * stratum into one sort task, so it serves only as [[stratifiedSample]]'s
    * per-stratum fallback for data that defies the hash brackets.
    */
  private[operators] def stratifiedSampleWindowed(
      df: DataFrame,
      strataCols: Seq[String] = Seq("lang", "source"),
      percent: Int = 20,
      idCol: String = "doc_id"): DataFrame = {
    val part = Window.partitionBy(strataCols.map(col): _*)
    val ord = part.orderBy(md5(col(idCol).cast("string")), col(idCol))
    df
      .withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn("__n", count(lit(1)).over(part))
      // integer ceil(n·percent/100) — float fractions would reopen the
      // engine-dependent-rounding trap on exact multiples
      .filter(col("__rn") <= expr(s"(__n * $percent + 99) div 100"))
      .select(col(idCol) +: strataCols.map(col): _*)
  }

  /** Per-customer running revenue: cumulative window sum in o_orderdate
    * order. Prices are centi-quantized per row BEFORE the cumulative sum so
    * every prefix is exact integer math (a double running sum would drift
    * differently per engine/order). Partitioned on the high-cardinality
    * customer key — bounded state per task at any scale.
    */
  def runningRevenue(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).over(w)
        .as("cum_revenue_centi"))
  }

  /** Inter-order gaps per customer: `lag` over the (high-cardinality)
    * customer key — the navigation-function shape for sessionization-style
    * derivations on batch data. The gap is exact integer micros (no
    * division — floor/trunc semantics differ across engines); first order
    * per customer has a NULL gap, standard lag semantics.
    */
  def orderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      lag(col("o_orderdate"), 1).over(w).as("prev_orderdate"))
      // NTZ timestamps cast through TIMESTAMP under the UTC session the
      // gates run with — identical to DuckDB's epoch_us on the naive value
      .withColumn("gap_micros",
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) - " +
          "unix_micros(CAST(prev_orderdate AS TIMESTAMP))"))
  }

  /** Pivot (long → wide): per-user event counts, one column per event type.
    * The value list is EXPLICIT — with it, pivot is a single groupBy with
    * conditional aggregates (one shuffle, map-side partials); without it
    * Spark must first run a distinct-values job, and the output schema
    * becomes data-dependent (a breaking move at 100 TB and for any oracle).
    * Missing cells filled with 0 to match conditional-count semantics.
    */
  def eventTypePivot(
      events: DataFrame,
      types: Seq[String] = Seq("click", "error", "purchase", "signup", "view"))
      : DataFrame =
    events
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)

  /** Semi-structured column extraction: pull typed fields out of a JSON
    * string column with JSONPath (`get_json_object`) — the pattern for
    * event-property columns at scale (map-only, codegen'd, no shuffle;
    * for repeated multi-field extraction prefer one `from_json` with an
    * explicit schema over N path probes).
    */
  def propsExtract(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      (get_json_object(col("props"), "$.k").cast("long") >= 50).cast("int")
        .as("k_high"))

  /** Arbitrary GROUPING SETS (beyond the rollup/cube lattices of a10/a11):
    * the caller picks exactly which grouping combinations materialize —
    * here (status, priority), (status), and the grand total, skipping the
    * (priority)-only set a cube would force. One pass over the fact table:
    * Spark expands the sets via Expand (rows × |sets|) and aggregates with
    * the usual partial/final split, so the shuffle carries one partial row
    * per (set, group), never the fact table. `grouping_id` disambiguates
    * the all-null total row from a genuine null group.
    */
  def orderGroupingSets(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(
          Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")),
          Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("price_centi"))

  /** Ordered event funnel (product analytics): for each user, the time of
    * the FIRST step-1 event, the first step-2 event STRICTLY AFTER it, and
    * the first step-3 event strictly after that — the standard "view →
    * click → purchase within a session" conversion measure, with strict
    * event-time ordering (a purchase before the first view does not count).
    *
    * Shape at 100 TB: each stage's plan branch scans a DISJOINT pushed-down
    * slice of the fact table (`event_type = <step>` reaches the columnar
    * scan — PlanSpec pins the pushed filters), so although the plan shows
    * one scan node per stage, the total bytes read equal one combined scan
    * of the funnel's types; row groups outside a branch's slice are skipped
    * by the pushed predicate. (A shared-scan formulation — pre-filter +
    * repartition reused across stages — was measured and rejected: filter
    * pushdown through the shared exchange is exactly what Catalyst gives
    * up, and materializing the slim fact to force reuse would checkpoint
    * the whole slice set.) Each stage shuffles only its slice's per-user
    * partial mins, and each stage's build side shrinks (users who reached
    * step k) — the funnel's own selectivity working for the plan. No
    * windows, no collect-events-per-user arrays — a power user with 10^8
    * events costs the same as anyone else.
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      tsCol: String = "ts",
      userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel requires at least one step")
    val firstStep = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_step1"))
    val reached = steps.zipWithIndex.drop(1).foldLeft(firstStep) {
      case (prev, (step, i)) =>
        val nextFirst = events.filter(col(typeCol) === step)
          .join(prev.select(col(userCol), col(s"t_step$i")), userCol)
          .filter(col(tsCol) > col(s"t_step$i"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t_step${i + 1}"))
        prev.join(nextFirst, Seq(userCol), "left")
    }
    reached
  }

  /** Trailing time-RANGE window aggregate: per-customer revenue over the
    * last `days` days as of each order — the moving-window class a15's
    * ROWS-frame prefix sum can't express (the frame is defined by event
    * TIME, not row count: gaps shrink it, same-day peers share it). Ordered
    * by integer epoch-micros with a numeric range frame so Spark and the
    * oracle compute the identical frame; summed centi-quantized for exact
    * integer accumulation in any order.
    *
    * Shape at 100 TB: one shuffle on the key; the range frame is a single
    * ordered pass per key partition with a sliding two-pointer window —
    * state is the in-frame slice, bounded by the densest `days` span, never
    * the whole key history.
    */
  def trailingRevenue(orders: DataFrame, days: Int = 30): DataFrame = {
    val micros = days.toLong * 86400L * 1000000L
    // NTZ timestamps cast through TIMESTAMP under the UTC session the gates
    // run with — identical to DuckDB's epoch_us on the naive value (a17)
    val odateMicros = expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(odateMicros)
      .rangeBetween(-micros, 0)
    orders.select(
      col("o_orderkey"), col("o_custkey"),
      odateMicros.as("odate_micros"),
      sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).over(w)
        .as("trailing_centi"))
  }

  /** A28: trailing-window COUNT DISTINCT — rolling active users (the DAU/
    * WAU shape: for every day with events, how many distinct users were
    * active in the trailing `days`-day window). SQL window frames cannot
    * express DISTINCT over a RANGE frame, so the windowed formulation
    * simply does not exist; the set shape has to be built:
    *
    *  1. one groupBy collapses raw events to distinct (day, user) pairs —
    *     the ONLY pass over the events table, partial-agg collapsing
    *     map-side (a user's thousandth event that day never shuffles);
    *  2. each distinct pair fans out to the ≤`days` window-days it serves
    *     (map-only `sequence` explode: rows ≈ pairs × days, bounded by the
    *     window length, never events × days);
    *  3. one count(DISTINCT user) per window day, clipped by a semi-join
    *     to days that actually have events (no phantom trailing days past
    *     the data's edge).
    *
    * At 100 TB the shuffles carry (day, user) pairs and their ×`days`
    * fan-out — both orders of magnitude below the raw event volume.
    */
  def rollingActiveUsers(events: DataFrame, days: Int = 7): DataFrame = {
    require(days >= 1, s"window must be at least one day, got $days")
    val pairs = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val daySet = pairs.select(col("day").as("window_day")).distinct()
    pairs
      .select(
        explode(expr(s"sequence(day, date_add(day, ${days - 1}))"))
          .as("window_day"),
        col("user_id"))
      .join(daySet, "window_day")
      .groupBy("window_day")
      .agg(countDistinct("user_id").as("active_users"))
      .select(col("window_day").as("day"), col("active_users"))
  }

  /** Footer-only table statistics: COUNT(*)/MIN/MAX answered from parquet
    * row-group metadata via aggregate pushdown — the scan reads footers, not
    * data pages. At 100 TB this is the difference between a multi-minute
    * full scan and a metadata pass measured in file-listing time: row counts
    * and column min/max are already materialized in every parquet footer,
    * and the V2 parquet source pushes the whole aggregate into the scan
    * (`PushedAggregation` in the plan — pinned by PlanSpec).
    *
    * Pushdown preconditions (why this runs on a cloned session): aggregate
    * pushdown is a DataSource V2 feature, and parquet defaults to the V1
    * path — the clone drops `parquet` from `useV1SourceList` and enables
    * `parquet.aggregatePushdown` without perturbing the caller's session.
    * No row filter is applied (a data filter disables the pushdown), and
    * the aggregated columns are plain INT64/DOUBLE — types whose footer
    * min/max statistics are trustworthy (no truncated binary stats).
    */
  def metadataStats(spark: SparkSession, lineitemPath: String): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    ss.conf.set(
      "spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text")
    ss.read.parquet(lineitemPath)
      .agg(
        expr("count(*)").as("cnt"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
  }

  /** Equi-width histogram quantiles (A27) — the selectivity half of
    * ANALYZE, completing A25/A26's statistics surface: per group, bucket a
    * value column into `nBuckets` equal-width bins over the GLOBAL
    * [min, max] and answer quantiles from the cumulative histogram (the
    * estimate = the right edge of the first bucket whose cumulative count
    * reaches ceil(q·n)). Histograms are what a cost-based planner consults
    * for range-predicate selectivity, and unlike rank-based exact
    * quantiles (A13's percentile pass) the histogram is MERGEABLE BY
    * ADDITION — per-partition histograms sum into the global one, so the
    * sketch maintains incrementally (A26's regime) and never re-sorts.
    *
    * Everything is engine-exact: bucket assignment is one IEEE expression
    * (identical op order in the oracle), thresholds are integer ceiling
    * divisions, and the estimate is a fixed double expression of (lo, hi,
    * bucket). Shape at 100 TB: one min/max pass (or A22 footer stats), one
    * (group, bucket) aggregate that collapses map-side into ≤ groups ·
    * nBuckets rows, a window over that tiny relation, output
    * groups × quantiles rows.
    */
  def histogramQuantiles(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      nBuckets: Int = 256,
      qMilli: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    require(nBuckets > 1 && qMilli.nonEmpty, "need buckets and quantiles")
    // eager checkpoint: the 1-row extremes feed both the bucketing scan and
    // the final estimate projection — materialize once, not two min/max
    // passes over the data
    val mm = df.agg(
      min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi"))
      .localCheckpoint(true)
    val bucketed = df.crossJoin(broadcast(mm)).select(
      col(groupCol),
      expr(s"""CASE WHEN hi = lo THEN 0L ELSE
                least(CAST(floor(($valueCol - lo) * $nBuckets.0D / (hi - lo)) AS BIGINT),
                      ${nBuckets - 1}L) END""").as("bucket"))
    // eager checkpoint: the cumulative window AND the per-group totals both
    // consume the histogram; left lazy, the two branches would each rerun
    // the full bucketing scan (the capBuckets lesson) — one materialization
    // of <= groups*buckets rows serves both
    val hist = bucketed.groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // per-group totals from the histogram itself — no second data scan
    val n = hist.groupBy(col(groupCol)).agg(sum(col("cnt")).as("n"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(
        Window.partitionBy(groupCol).orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0)))
    val qs = qMilli.map(q => s"$q").mkString(", ")
    val sel = cum.join(n, groupCol)
      .crossJoin(broadcast(
        df.sparkSession.range(1).select(explode(expr(s"array($qs)")).as("q_milli"))))
      .filter(col("cum") >= expr("(n * q_milli + 999L) div 1000L"))
      .groupBy(col(groupCol), col("q_milli"))
      .agg(min(col("bucket")).as("bucket"))
    sel.crossJoin(broadcast(mm)).select(
      col(groupCol), col("q_milli"), col("bucket"),
      expr(s"CAST(floor((lo + (bucket + 1) * (hi - lo) / $nBuckets.0D) * 100) AS BIGINT)")
        .as("est_centi"))
  }
}
