package graft.operators

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-invariant regression tests: the physical shapes the per-round plan
  * audits verified by hand, pinned so a future change that silently
  * regresses one (a broadcast that becomes a cartesian product, a filter
  * that stops reaching the scan, a top-k that materializes a full sort)
  * fails the suite instead of the next bench.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("r3 comma join plans as broadcast hash join, never cartesian") {
    val p = plan("r3_join_comma")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast hash join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product leaked:\n$p")
  }

  test("r3 n-way join: all three joins hash-based, no cartesian/BNLJ") {
    val p = plan("r3_join_nway")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi fallback in the n-way join:\n$p")
  }

  test("r4 filter is pushed down to the parquet scan") {
    val p = formatted(SparkEntry.queries("r4_filter")(spark, sf))
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      s"no pushed filters in scan:\n$p")
    assert(p.contains("l_quantity") && p.contains("l_returnflag"),
      s"expected predicates not pushed:\n$p")
  }

  test("r7 scan prunes columns: ReadSchema carries only referenced fields") {
    val p = formatted(SparkEntry.queries("r7_expr_functions")(spark, sf))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty, s"no ReadSchema in:\n$p")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"unreferenced columns not pruned from scan: $readSchema")
  }

  test("a4 top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("a4_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not limit-pushed:\n$p")
  }

  test("a2 dims broadcast: nation side joins without a shuffle") {
    val p = plan("a2_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$p")
  }

  test("e3 date-window scan prunes partitions at the directory level") {
    val df = SparkEntry.queries("e3_events_daily_pruned")(spark, sf)
    val p = formatted(df)
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("event_date"), s"no partition filter on event_date:\n$p")
    assert(!pf.replaceAll("\\s", "").contains("PartitionFilters:[]"),
      s"partition filters empty — scan reads every date dir:\n$p")
    // the pruned scan must touch only the 7 selected date partitions
    // (unwrap the AQE wrapper — it presents as a single leaf node)
    df.count()
    val physical = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scanned = physical.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.nonEmpty && scanned.forall(_ == 7),
      s"expected exactly 7 date partitions scanned, got $scanned")
  }

  test("k1 ranking is the bounded top-k aggregate — no window, no global per-query sort") {
    val p = plan("k1_topk_cosine")
    assert(!p.contains("Window"),
      s"k1 regressed to a row_number window (single task sorts the corpus per query):\n$p")
    assert(p.contains("graft_topk") && p.contains("ObjectHashAggregate"),
      s"bounded top-k aggregate missing from the plan:\n$p")
    // scoring side stays broadcast — corpus vectors never shuffle for scoring
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
  }

  test("d9 incremental dedup plans equi-joins only — no cartesian, no BNLJ") {
    val p = plan("d9_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in the incremental dedup plan:\n$p")
  }
}
