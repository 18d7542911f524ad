package graft.catalog

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Table-statistics surface (A25) — the ANALYZE-shaped catalog artifact the
  * reference has no analogue of (its backend delegates all planning to
  * ClickHouse, `/root/reference/backend/main.py:163-182`): per (table, key
  * column) row counts, null counts, min/max, and an NDV estimate, persisted
  * as a parquet relation and exposed to queries as `graft_table_stats`.
  *
  * WHY it exists at 100 TB: AQE re-plans from runtime shuffle sizes, but the
  * FIRST plan of a query — join order, broadcast decisions before any stage
  * has run — can only come from table-level statistics. This relation is the
  * engine's native ANALYZE output: the numbers a cost-based reorder consults
  * (`spark.sql.cbo.*` reads the same shape from the metastore), kept as a
  * plain queryable table so pipelines can ALSO gate on them (e.g. "refuse to
  * broadcast a side whose stats row says > 100M rows", or freshness checks
  * comparing n_rows across ANALYZE runs).
  *
  * HOW each number is computed, and why the shapes survive 100×:
  *  - ANALYZE ([[analyze]]) does ONE column-pruned data scan per TABLE: all
  *    profiled columns' counts, min/max, and KMV sets are parallel
  *    aggregates of a single `agg` ([[tableSketch]]), so a C-column table
  *    costs one pass, not C. ([[columnStats]] keeps the per-column
  *    footer-pushdown variant — O(files) count/min/max via the A22 recipe —
  *    for single-column probes.)
  *  - NDV is the A18 KMV sketch (k smallest md5 values of the column),
  *    bit-deterministic in any engine — unlike HLL, whose hash and bias
  *    table are engine-private — so the ESTIMATE itself is oracle-gateable.
  *    The k-minimum selection is a global bounded top-k (TakeOrdered over
  *    distinct hashes, k rows cross the wire per table), the same
  *    fixed-size-summary contract as the A24 Misra-Gries pass.
  */
object TableStats {

  /** The key column profiled per provisioned table — the join/identity
    * column whose NDV and range drive join planning. All integer-typed, so
    * min/max unify to BIGINT and footer statistics are trustworthy (no
    * truncated binary stats, the same caveat A22 documents).
    */
  val statColumns: Seq[(String, String)] = Seq(
    "region" -> "r_regionkey",
    "nation" -> "n_nationkey",
    "customer" -> "c_custkey",
    "supplier" -> "s_suppkey",
    "part" -> "p_partkey",
    "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey",
    "events" -> "event_id",
    "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  /** View name [[statsRelation]] registers — the catalog relation queries
    * join against.
    */
  val ViewName = "graft_table_stats"

  /** One stats row for (table, column): `(table_name, column_name, n_rows,
    * n_nulls, min_key, max_key, ndv_milli)`.
    *
    * Two passes with different physical shapes: a footer-only aggregate
    * (count/min/max through parquet aggregate pushdown on a cloned session,
    * A22's exact recipe) and one column-pruned data pass for the KMV
    * sketch. The two one-row results combine via a broadcast-trivial cross
    * join.
    */
  def columnStats(
      spark: SparkSession,
      dir: String,
      table: String,
      column: String,
      k: Int = 32,
      pushdownSession: Option[SparkSession] = None): DataFrame = {
    require(k > 1, s"KMV needs k > 1, got $k")
    // footer-only: count(*) + count(col) + min/max push to parquet metadata
    // (V2 path + aggregatePushdown, cloned session so the caller's session
    // is not perturbed — see metadataStats). nanosAsLong: events carries a
    // TIMESTAMP(NANOS) column that must convert at footer-read time even
    // though only the key column is aggregated. ANALYZE over many tables
    // passes ONE shared clone via `pushdownSession` instead of paying a
    // session spin-up per table.
    val ss = pushdownSession.getOrElse(newPushdownSession(spark))
    val meta = ss.read.parquet(Tables.path(dir, table))
      .agg(
        expr("count(*)").as("__n"),
        count(col(column)).as("__nn"),
        min(col(column)).as("__min"),
        max(col(column)).as("__max"))
      .select(
        col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_nulls"),
        col("__min").cast("bigint").as("min_key"),
        col("__max").cast("bigint").as("max_key"))

    // KMV NDV: distinct md5 hashes, global k smallest (bounded TakeOrdered),
    // then the a18 estimator — (k-1)/U(k) over the 2^60 space of 15 hex
    // digits, floor-milli quantized; under k distinct values the sketch is
    // exact by definition.
    val est = s"CAST(floor(${k - 1}.0D * CAST(1152921504606846976L AS DOUBLE) / " +
      "CAST(CAST(conv(substring(hk, 1, 15), 16, 10) AS BIGINT) AS DOUBLE) " +
      "* 1000.0D) AS BIGINT)"
    val sketch = Tables.load(spark, dir, table)
      .select(md5(col(column).cast("string")).as("h"))
      .where(col("h").isNotNull)
      .distinct()
      .orderBy("h")
      .limit(k)
      .agg(count(lit(1)).as("sketch_k"), max(col("h")).as("hk"))
      .select(
        when(col("sketch_k") < k, col("sketch_k") * 1000L)
          .otherwise(expr(est))
          .as("ndv_milli"))

    meta.crossJoin(sketch).select(
      lit(table).as("table_name"),
      lit(column).as("column_name"),
      col("n_rows"), col("n_nulls"), col("min_key"), col("max_key"),
      col("ndv_milli"))
  }

  /** One cloned session with parquet aggregate pushdown enabled (V2 source)
    * — the A22 recipe, isolated so the caller's session is untouched.
    */
  private def newPushdownSession(spark: SparkSession): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    ss.conf.set(
      "spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text")
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ss
  }

  /** All of one table's profiled columns sketched in ONE data pass: the
    * per-column (non-null count, min, max, KMV bottom-k set) are C parallel
    * aggregates of a single `agg` over one column-pruned scan — the
    * `graft_kmv` bounded aggregate replaces [[columnStats]]'s per-column
    * `distinct → sort → limit` (a full shuffle of every unique hash, once
    * per column). A C-column table costs ONE scan, not C; the one-row wide
    * result explodes into the per-column [[sketch]] schema.
    */
  def tableSketch(
      spark: SparkSession,
      dir: String,
      table: String,
      columns: Seq[String],
      k: Int = 32): DataFrame = {
    require(columns.nonEmpty, s"tableSketch($table) needs at least one column")
    require(k > 1, s"KMV needs k > 1, got $k")
    graft.functions.GraftFunctions.register(spark)
    val df = Tables.load(spark, dir, table)
    val aggs: Seq[org.apache.spark.sql.Column] =
      expr("count(*)").as("n_rows") +: columns.map { c =>
        struct(
          count(col(c)).as("nn"),
          min(col(c)).cast("bigint").as("min_key"),
          max(col(c)).cast("bigint").as("max_key"),
          expr(s"graft_kmv(md5(cast(`$c` as string)), $k)").as("kmv")
        ).as(s"__s_$c")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // reshape the single wide row to one row per column WITHOUT re-running
    // the aggregate per column: one array-of-structs, one explode
    val entries = array(columns.map(c =>
      struct(lit(c).as("column_name"), col(s"__s_$c").as("s"))): _*)
    one.select(col("n_rows"), explode(entries).as("e"))
      .select(
        lit(table).as("table_name"),
        col("e.column_name").as("column_name"),
        col("n_rows"),
        (col("n_rows") - col("e.s.nn")).as("n_nulls"),
        col("e.s.min_key").as("min_key"),
        col("e.s.max_key").as("max_key"),
        col("e.s.kmv").as("kmv"))
  }

  /** ANALYZE: stats for every (table, column) pair, persisted as one parquet
    * relation at `outPath` (overwrite — each run is a full refresh, the
    * ANALYZE semantic). Physical shape: ONE data scan per TABLE via
    * [[tableSketch]] (all of a table's columns ride the same pass), NDV
    * resolved from the KMV sets by [[finalizeStats]] — numerically identical
    * to the old per-column derivation, minus the per-column rescans. A
    * handful of rows regardless of data scale: coalesced to a single file.
    */
  def analyze(
      spark: SparkSession,
      dir: String,
      outPath: String,
      tables: Seq[(String, String)] = statColumns,
      k: Int = 32): Unit = {
    require(tables.nonEmpty, "analyze needs at least one (table, column)")
    import scala.concurrent.duration.Duration
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val tableOrder = tables.map(_._1).distinct
    // CONCURRENT per-table jobs: each sketch is a single footer/one-pass
    // aggregate over a DIFFERENT table, so the jobs contend on nothing and
    // their fixed per-job overhead (planning, codegen, stage scheduling)
    // overlaps instead of serializing — the former single unioned action
    // paid it 10x back to back. Each result is ≤ #columns rows (a bounded
    // driver materialization, the centroid contract); the tiny union is
    // finalized and written once.
    val futures = tableOrder.map { t =>
      Future {
        val df = tableSketch(spark, dir, t,
          tables.collect { case (`t`, c) => c }, k)
        (df.schema, df.collect().toIndexedSeq)
      }
    }
    // unbounded wait in 60 s slices WITH a diagnostic: the overall
    // semantics stay "wait for completion, not a deadline" (an arbitrary
    // cap would be a silent scale ceiling), but a hung FS call now names
    // the stuck table on stderr every minute instead of stalling ANALYZE
    // with no signal at all
    val collected = tableOrder.zip(futures).map { case (table, fut) =>
      var res: Option[(org.apache.spark.sql.types.StructType,
        IndexedSeq[org.apache.spark.sql.Row])] = None
      var waited = 0L
      while (res.isEmpty) {
        try res = Some(Await.result(fut, scala.concurrent.duration.Duration(60, "s")))
        catch {
          case _: java.util.concurrent.TimeoutException =>
            waited += 60
            System.err.println(s"[analyze] table '$table' sketch still " +
              s"running after ${waited}s — waiting (a hung FS call " +
              "surfaces here, not as a silent stall)")
        }
      }
      res.get
    }
    val stats = spark.createDataFrame(
      spark.sparkContext.parallelize(collected.flatMap(_._2), 1),
      collected.head._1)
    // BYTE-aware sizing rides along: per-table on-disk bytes from ONE
    // filesystem content-summary call each (metadata-only, the unit
    // Spark's own autoBroadcastJoinThreshold speaks — n_rows is a weak
    // broadcast proxy for wide rows, the exact case a29's planner would
    // get wrong). Joined driver-side onto the tiny finalized relation.
    val bytesDf = spark.createDataFrame(
      tableOrder.map(t => org.apache.spark.sql.Row(t, tableBytes(spark, dir, t))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("table_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("total_bytes",
          org.apache.spark.sql.types.LongType))))
    finalizeStats(stats, k)
      .join(broadcast(bytesDf), Seq("table_name"), "left")
      .coalesce(1).write.mode("overwrite").parquet(outPath)
  }

  /** On-disk bytes of one table's backing file/directory — a single
    * Hadoop content-summary call, no data read.
    */
  private def tableBytes(spark: SparkSession, dir: String, table: String): Long = {
    val p = new org.apache.hadoop.fs.Path(Tables.path(dir, table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
  }

  /** Mergeable per-slice statistics sketch (A26) — the incremental half of
    * ANALYZE. [[columnStats]] is a full-refresh; at 100 TB nobody rescans
    * the whole table because one partition arrived. Every number here is a
    * MERGEABLE summary:
    *  - n_rows / n_nulls merge by addition, min/max by min/max;
    *  - NDV state is the KMV k-minimum-hash SET itself (not the estimate):
    *    bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)), so merging
    *    sketches is EXACTLY the sketch of the union — the estimate derived
    *    after any merge tree equals the single-pass estimate, which is what
    *    makes the merge oracle-gateable to equality, not approximation.
    *
    * Scan shape: one column-pruned pass over the SLICE only (the delta
    * being absorbed — the whole point), distinct + bounded TakeOrdered for
    * the k hashes, every output O(k).
    */
  def sketch(
      df: DataFrame,
      table: String,
      column: String,
      k: Int = 32): DataFrame = {
    require(k > 1, s"KMV needs k > 1, got $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // ONE aggregation over one pass of the slice: counts/min/max and the
    // bounded `graft_kmv` bottom-k set ride the same scan (the old shape
    // cross-joined a counts agg with a distinct→sort→limit leg — two scans
    // and a full unique-hash shuffle per absorbed slice)
    df.agg(
      expr("count(*)").as("n_rows"),
      (expr("count(*)") - count(col(column))).as("n_nulls"),
      min(col(column)).cast("bigint").as("min_key"),
      max(col(column)).cast("bigint").as("max_key"),
      expr(s"graft_kmv(md5(cast(`$column` as string)), $k)").as("kmv"))
    .select(
      lit(table).as("table_name"),
      lit(column).as("column_name"),
      col("n_rows"), col("n_nulls"), col("min_key"), col("max_key"),
      col("kmv"))
  }

  /** Merge any number of [[sketch]] rows per (table, column): additive
    * counts, min/max of extremes, k smallest of the united hash sets. The
    * collect_list is bounded at #sketches·k strings per group (merge in
    * trees if absorbing millions of slices at once).
    */
  def mergeSketches(sketches: DataFrame, k: Int = 32): DataFrame =
    sketches.groupBy("table_name", "column_name").agg(
      sum("n_rows").as("n_rows"),
      sum("n_nulls").as("n_nulls"),
      min("min_key").as("min_key"),
      max("max_key").as("max_key"),
      expr(s"slice(array_sort(array_distinct(flatten(collect_list(kmv)))), 1, $k)")
        .as("kmv"))

  /** Resolve a merged sketch to the [[columnStats]] schema: derive
    * `ndv_milli` from the k-minimum set with the same estimator a25 gates
    * (exact by definition under k distinct values).
    */
  def finalizeStats(merged: DataFrame, k: Int = 32): DataFrame = {
    val est = s"CAST(floor(${k - 1}.0D * CAST(1152921504606846976L AS DOUBLE) / " +
      s"CAST(CAST(conv(substring(element_at(kmv, $k), 1, 15), 16, 10) AS BIGINT) AS DOUBLE) " +
      "* 1000.0D) AS BIGINT)"
    merged.select(
      col("table_name"), col("column_name"),
      col("n_rows"), col("n_nulls"), col("min_key"), col("max_key"),
      when(size(col("kmv")) < k, size(col("kmv")).cast("long") * 1000L)
        .otherwise(expr(est))
        .as("ndv_milli"))
  }

  /** Read a persisted ANALYZE artifact back and expose it to SQL as
    * [[ViewName]] — the catalog-relation half of the surface.
    */
  def statsRelation(spark: SparkSession, outPath: String): DataFrame = {
    val df = spark.read.parquet(outPath)
    df.createOrReplaceTempView(ViewName)
    df
  }

  /** The full a25 pipeline: ANALYZE into a scratch root, then read the
    * persisted relation back (so the gated query exercises the real
    * artifact, not an in-memory shortcut). Deliberately does NOT register
    * [[ViewName]]: the gated query must leave the session catalog exactly
    * as it found it (C1's listing is itself oracle-gated), so the view
    * exposure is [[statsRelation]]'s explicit opt-in.
    */
  def analyzed(spark: SparkSession, dir: String, k: Int = 32): DataFrame = {
    val out = graft.core.TempDirs.createFast("graft_table_stats_") + "/stats"
    analyze(spark, dir, out, statColumns, k)
    spark.read.parquet(out)
  }
}
