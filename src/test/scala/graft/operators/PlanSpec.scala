package graft.operators

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, lit, when}

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

  test("x26 main-content extraction is map-only: one projection, no shuffle, no UDF") {
    val p = plan("x26_main_content")
    assert(!p.contains("Exchange"), s"extraction shuffled:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"extraction fell off codegen into a UDF:\n$p")
  }

  test("p8 shard writer: hash exchange + per-shard rank, never a global sort") {
    // the derivation (not the stored read-back): one partial-aggregated
    // exchange for the bins, one hash exchange into shards, per-shard
    // window rank — a global Sort node (no partitioning) would be the
    // scale bug
    val packed = graft.operators.TextAnalysis.packSequences(
      graft.core.Tables.load(spark, sf, "documents"))
    val p = graft.operators.TextAnalysis.trainingShards(packed)
      .queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"),
      s"global sort leaked into the shard writer:\n$p")
  }

  test("a29 stats-planned join: broadcasts chosen from the ANALYZE artifact before any stage runs") {
    // the INITIAL physical plan (nothing executed yet) must already carry
    // the stats-chosen broadcasts — the decision AQE can only make after
    // the first shuffle's runtime sizes exist; here it comes from the
    // persisted a25 relation at plan time. At sf0.001 every star side is
    // under the ceiling, so both joins must be broadcast hash joins with
    // zero shuffle exchanges on the build sides.
    val p = plan("a29_stats_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"stats-chosen sides not broadcast at initial planning:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"stats-planned star degraded to a shuffle join:\n$p")
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

  test("a22 stats aggregate is pushed into the parquet scan (footer-only)") {
    val df = SparkEntry.queries("a22_metadata_stats")(spark, sf)
    val p = formatted(df)
    val pushed = p.linesIterator.filter(_.contains("PushedAggregation")).mkString
    assert(pushed.contains("COUNT(*)") && pushed.contains("MIN(l_orderkey)") &&
      pushed.contains("MAX(l_extendedprice)"),
      s"aggregate not pushed to the scan (expected footer-only metadata pass):\n$p")
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

  test("k14 BM25: no window, no cartesian; query terms broadcast; ranking is the bounded aggregate") {
    val p = plan("k14_bm25_topk")
    assert(!p.contains("Window"),
      s"k14 regressed to a row_number window over the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in BM25 scoring:\n$p")
    assert(p.contains("graft_topk"),
      s"bounded top-k aggregate missing:\n$p")
    // the (tiny) query-term relation must broadcast into the postings scan
    assert(p.contains("BroadcastHashJoin"),
      s"query terms not broadcast against postings:\n$p")
  }

  test("k15 RRF fusion: both legs window-free, fusion is a plain aggregate") {
    val p = plan("k15_hybrid_rrf")
    assert(!p.contains("Window"), s"RRF legs regressed to window ranking:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in fusion:\n$p")
    assert(p.contains("graft_topk"), s"bounded ranking missing:\n$p")
  }

  test("x24 fuzzy decontamination: eval gram index broadcast, train side never shuffles grams") {
    val p = plan("x24_fuzzy_decontamination")
    assert(!p.contains("CartesianProduct"), s"doc×doc pairing crept in:\n$p")
    // the gh-key candidate join must be broadcast (eval side is small by
    // nature); the only shuffles are the bounded per-pair/per-eval aggs
    assert(p.contains("BroadcastHashJoin"),
      s"eval gram index not broadcast:\n$p")
  }

  test("a28 rolling actives: map-side partial aggregation, no cartesian") {
    val p = plan("a28_rolling_actives")
    // pairs collapse + final count(DISTINCT) both want partial/final pairs
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("k12b approximate MIPS: candidates from band equi-joins, no cartesian") {
    val p = plan("k12b_mips_ann")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the MIPS LSH candidate join:\n$p")
  }

  test("k12 MIPS scoring is broadcast + map-only like k1: no corpus-side shuffle join") {
    val p = plan("k12_mips_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for MIPS scoring:\n$p")
  }

  test("d9 incremental dedup plans equi-joins only — no cartesian, no BNLJ") {
    val p = plan("d9_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in the incremental dedup plan:\n$p")
  }

  test("j6 bloom probe is a plain filter (literal filter, no join for the probe)") {
    val p = plan("j6_bloom_semi")
    assert(p.contains("graft_bloom_contains"), s"bloom probe missing:\n$p")
    // the filter must NOT reintroduce the one-row cross join that copied
    // the 512 KB filter into every probe row (the round-7 j6 regression)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bloom probe regressed to a join:\n$p")
  }

  test("j7 SCD2 windows share one sort: a single exchange on the key") {
    val p = plan("j7_scd2")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"SCD2 expected exactly one key shuffle, found $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("k4 PQ: no window ranking, no cartesian; shortlist is the bounded aggregate") {
    val p = plan("k4_pq_topk")
    assert(!p.contains("Window"),
      s"PQ ranking regressed to a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
    assert(p.contains("graft_topk"), s"bounded shortlist aggregate missing:\n$p")
  }

  test("k9 binary-quant: signature scan is broadcast-only, shortlist bounded, no window") {
    val p = plan("k9_binary_topk")
    assert(!p.contains("Window"), s"k9 ranking regressed to a window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus signatures shuffled for the Hamming scan:\n$p")
    assert(p.contains("graft_topk"), s"bounded shortlist aggregate missing:\n$p")
  }

  test("x20 DSIR: no window, no cartesian on the corpus; selection is the bounded aggregate") {
    val p = plan("x20_importance_select")
    assert(!p.contains("Window"),
      s"x20 selection regressed to a window rank:\n$p")
    assert(p.contains("graft_topk"), s"bounded selection aggregate missing:\n$p")
  }

  test("d11 semantic dedup: candidate generation equi-only — no cartesian pair join") {
    val p = plan("d11_semantic_dedup")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the semantic-dedup plan:\n$p")
  }

  test("m6 scene keyframes: one per-video lag window, no cartesian, no corpus sort beyond it") {
    val p = plan("m6_scene_keyframes")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi fallback in the keyframe plan:\n$p")
    // exactly one Window operator — the bounded per-video lag; a second
    // would mean the transition series is derived twice
    assert(p.sliding("Window".length).count(_ == "Window") >= 1 &&
      "Window \\[".r.findAllIn(p).length <= 1,
      s"unexpected window count in:\n$p")
  }

  test("p7 media curation: keyframe pair join equi-only, no cartesian") {
    val p = plan("p7_media_curation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi fallback in the curation plan:\n$p")
  }

  test("st17 heavy-hitters search: candidate filter is a literal map-side filter — no join, no window") {
    val p = plan("st17_heavy_hitters_maintain")
    assert(!p.contains("Join") && !p.contains("CartesianProduct") &&
      !p.contains("Window"),
      s"st17 search must be filter+aggregate only:\n$p")
  }

  test("x25 collocations: global top-k is TakeOrderedAndProject, never a full sort; no cartesian") {
    val p = plan("x25_collocations")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not limit-pushed:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("a27 histogram: no global sort of the data; only the tiny histogram window sorts") {
    val p = plan("a27_histogram_quantiles")
    // rangepartitioning = a global data sort; the histogram path must not
    // have one (the only Sort serves the <= groups x buckets window)
    assert(!p.contains("rangepartitioning"),
      s"histogram quantiles global-sorted the data:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("p4 mixture sampling: rate table broadcast back, corpus never shuffles whole rows") {
    val p = plan("p4_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), s"rate join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"corpus-side shuffle join leaked into the sampling plan:\n$p")
  }

  test("d10 paragraph dedup: equi-joins only, ranking is aggregate min — no window") {
    val p = plan("d10_paragraph_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in the paragraph dedup plan:\n$p")
    assert(!p.contains("Window"),
      s"first-occurrence rule regressed to a window rank:\n$p")
  }

  test("a19 funnel: disjoint pushed type-slices per stage, no window, no cartesian") {
    val df = SparkEntry.queries("a19_funnel")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"funnel stage ranked via a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in the funnel plan:\n$p")
    // every stage branch reads its own DISJOINT slice at the scan: all
    // three per-step equality filters must be PUSHED — together the
    // branches read the bytes of one combined scan (see funnel's doc)
    val f = formatted(df)
    Seq("view", "click", "purchase").foreach { step =>
      assert(f.contains(s"EqualTo(event_type,$step)"),
        s"stage filter for '$step' not pushed to the events scan:\n$f")
    }
  }

  test("AQE splits a skewed sort-merge join (skew=true in the final plan)") {
    val s = spark
    import s.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // tiny thresholds so the fixture's hot key counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key (80% of rows) + a spread tail, joined to a small dim
      val fact = spark.range(0, 100000)
        .select(when(col("id") % 5 =!= 0, lit(0L)).otherwise(col("id") % 97).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 97).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = fact.join(dim, "k")
      // AQE decides at runtime: run THIS frame's own QueryExecution
      // (count()/write wrap it in a fresh one and would leave joined's
      // adaptive plan unexecuted), then read the final plan
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
