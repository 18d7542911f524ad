package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join shapes Spark's built-in operators lack, composed from the primitives
  * Catalyst optimizes well (north-star extension, SURVEY.md §7.4 — the
  * reference's join surface is comma-joins only, `backend/main.py:176-180`).
  *
  * Escalation-ladder note (SURVEY §2 preamble): these are case (a) — the
  * semantics compose from existing operators (union + window), so no custom
  * LogicalPlan/Strategy is justified.
  */
object Joins {

  /** As-of join: attach to every left row the LATEST right row whose
    * `tsCol` is ≤ the left row's, per `keyCol` (inclusive match, left-outer:
    * left rows with no prior right row keep nulls).
    *
    * Implementation is the union + last-carry-forward pattern, not a
    * per-left-row lookup: tag both sides, union, and carry the right payload
    * with `last(ignoreNulls)` over (key ORDER BY ts, side, seq) ROWS
    * UNBOUNDED PRECEDING. That is ONE shuffle on the key and a single
    * sequential pass per key partition — at 100 TB it scales exactly like
    * any keyed window (state is one carried struct per partition stream),
    * where the naive range join (left × right on key with ts ≤, then argmax)
    * explodes quadratically per key.
    *
    * Determinism: the window order (ts, side, seq) is a TOTAL order when
    * `seqCol` is unique per side — right rows sharing (key, ts) resolve to
    * the largest seq, and a right row tying a left row's ts sorts first
    * (side 0 < 1), which yields the inclusive ≤ semantics.
    *
    * Output = `leftCols` as-is plus `rightCols` renamed with `rightPrefix`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      leftCols: Seq[String],
      rightCols: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    val lt = StructType(left.select(leftCols.map(col): _*).schema.fields)
    val rt = StructType(right.select(rightCols.map(col): _*).schema.fields)
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(seqCol).cast("long").as("__seq"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lpay"),
      lit(null).cast(rt).as("__rpay"))
    val r = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(seqCol).cast("long").as("__seq"), lit(0).as("__side"),
      lit(null).cast(lt).as("__lpay"),
      struct(rightCols.map(col): _*).as("__rpay"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__lpay.$c").as(c)) ++
          rightCols.map(c => col(s"__match.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Banded (bucketized) range join: all (left, right) pairs with
    * |left.ts − right.ts| ≤ maxGap, WITHOUT any equi-key.
    *
    * Naively this is a theta join — Catalyst can only plan it as a
    * BroadcastNestedLoopJoin (quadratic work, broadcast-bounded). Instead
    * both sides are bucketed by ⌊epoch/maxGap⌋: any qualifying pair's
    * buckets differ by at most 1, so exploding the left row into buckets
    * {b−1, b, b+1} turns the range predicate into an EQUI join on the
    * bucket + an exact residual filter. Each right row carries exactly one
    * bucket, so no pair is emitted twice. Work becomes O(pairs-in-band)
    * with a plain shuffle hash join — the standard interval-join shape
    * (Flink's interval join and streaming state joins bucket time the same
    * way). Skew = a hot time bucket; shrink the band or sub-salt if one
    * window dominates.
    *
    * Output: `leftCols` as-is, `rightCols` prefixed, plus `gap_micros`
    * (right − left, signed, exact integer — no division, whose floor/trunc
    * semantics differ across engines).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      tsCol: String,
      maxGapSec: Long,
      leftCols: Seq[String],
      rightCols: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    require(maxGapSec > 0, "maxGapSec must be positive")
    val gapUs = maxGapSec * 1000000L
    val l = left.select(
      struct(leftCols.map(col): _*).as("__lpay"),
      unix_micros(col(tsCol)).as("__lus"))
      .withColumn("__b", explode(array(
        expr(s"__lus div $gapUs - 1"),
        expr(s"__lus div $gapUs"),
        expr(s"__lus div $gapUs + 1"))))
    val r = right.select(
      struct(rightCols.map(col): _*).as("__rpay"),
      unix_micros(col(tsCol)).as("__rus"))
      .withColumn("__b", expr(s"__rus div $gapUs"))
    l.join(r, "__b")
      .filter(abs(col("__rus") - col("__lus")) <= gapUs)
      .select(
        leftCols.map(c => col(s"__lpay.$c").as(c)) ++
          rightCols.map(c => col(s"__rpay.$c").as(s"$rightPrefix$c")) :+
          (col("__rus") - col("__lus")).as("gap_micros"): _*)
  }

  /** Keyed upsert (MERGE): rows from `updates` replace same-key rows in
    * `base`; unmatched update rows are inserted; unmatched base rows are
    * kept. The natural extension of the reference's append-only import
    * (`backend/main.py:274-286` only ever INSERTs) — implemented as ONE
    * full-outer shuffle join on the key with per-column coalesce
    * (update wins). At table-format scale the same statement is Delta/
    * Iceberg MERGE INTO; this is the engine-level equivalent for plain
    * relations. `updates` must be unique per key (enforce upstream);
    * column sets must match `base`'s.
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCol: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      "base and updates must share the same schema")
    val cols = base.columns.toSeq
    // Row-wise update-wins (keyed on the update key's presence), NOT
    // per-column coalesce: an update row's legitimate NULL must replace the
    // base value, exactly as MERGE ... WHEN MATCHED THEN UPDATE does.
    base.as("b")
      .join(updates.as("u"), col(s"b.$keyCol") === col(s"u.$keyCol"), "full_outer")
      .select(cols.map { c =>
        (if (c == keyCol) coalesce(col(s"u.$keyCol"), col(s"b.$keyCol"))
         else when(col(s"u.$keyCol").isNotNull, col(s"u.$c"))
           .otherwise(col(s"b.$c"))).as(c)
      }: _*)
  }

  /** Salted equi-join for SKEWED key distributions: a hot key's rows land
    * in one shuffle partition and serialize through one task; salting
    * splits each left key into `salts` sub-keys (deterministically, from
    * xxhash64 of a unique left column — no RNG state) and replicates the
    * right side across all salts, so the hot key fans out over `salts`
    * tasks. Result set is identical to the plain inner equi-join (pinned
    * by spec). Cost: the right side shuffles `salts`× — use for
    * many-to-one joins where the right side is modest but too big to
    * broadcast and the left is heavily skewed. (AQE's skewJoin handles
    * sort-merge skew automatically at runtime — [[graft.core.Engine]]
    * enables it; this is the explicit form for when the optimizer can't,
    * e.g. non-SMJ plans or pre-AQE engines.)
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      salts: Int,
      leftSeedCol: String): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename it on the inputs")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftSeedCol)), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    l.join(r, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** SCD Type-2 historization: turn a change stream (key, ts, attributes)
    * into versioned dimension rows with [effective_from, effective_to)
    * validity ranges — `effective_to` NULL marks the current version. The
    * standard warehouse move for "what did this dimension row look like
    * when the fact happened" (the as-of join J1 then consumes exactly this
    * shape). Complements J3/ST8, which keep only the latest version (SCD1).
    *
    * Consecutive duplicate versions are collapsed: a change row that
    * repeats the previous row's attributes verbatim opens no new version
    * (at-least-once delivery of the same snapshot must not fragment
    * history). Comparison is null-safe per attribute (`<=>`).
    *
    * Determinism: rows are ordered per key by (ts, seq) where `seqCol` is
    * unique per key — ties at the same timestamp resolve by seq, and the
    * LAST of same-ts changes wins the open version (its predecessors get
    * zero-width [ts, ts) ranges, dropped by the width filter).
    *
    * Shape at 100 TB: ONE shuffle on the key; both windows (change
    * detection + range close) share the same (key, ts, seq) sort, so
    * Catalyst plans a single Sort + two Window passes streamed per key
    * partition — state is one previous row, never a per-key buffer.
    */
  def scd2Historize(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2Historize requires at least one attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || lag(col(tsCol), 1).over(w).isNull
    val versions = changes
      .withColumn("__new_version", changed)
      .filter(col("__new_version"))
      .drop("__new_version")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    versions
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w2))
      // zero-width versions (several distinct versions at one ts): only the
      // last survives; [t, t) ranges can never match an as-of probe
      .filter(col("effective_to").isNull || col("effective_from") =!= col("effective_to"))
      .withColumn("is_current", col("effective_to").isNull)
      .select((keyCol +: attrCols).map(col) ++ Seq(
        col("effective_from"), col("effective_to"), col("is_current")): _*)
  }

  /** Bloom-pruned semi join: semi-join reduction for the case where the
    * build side is too large to broadcast as a hash relation but its KEY SET
    * compresses into a fixed-size Bloom filter. The build side aggregates
    * into one `binary` filter ([[graft.functions.BloomAggregate]] — partial
    * per-partition bit arrays OR-merged, so the build never shuffles its
    * rows), the single-row filter broadcasts to every probe task, and the
    * probe side drops non-members BEFORE its shuffle — at 100 TB the
    * exchange then carries only the ~selectivity fraction of the fact table
    * (plus the filter's false positives). The exact semi join downstream
    * removes false positives, so the result is row-identical to
    * `fact SEMI JOIN build` with any sizing (pinned by spec and by the j6
    * value oracle).
    *
    * This is Spark's own runtime-filter shape (InjectRuntimeFilter) exposed
    * as a composable operator: explicit sizing, any build-side expression,
    * and a filter you could persist and reuse across queries (it is just a
    * binary value).
    *
    * The built filter is collected to the driver and embedded as a LITERAL
    * in the probe-side predicate — one bounded value (numBits/8 bytes, by
    * construction, never a function of row count), shipped once per task
    * via the serialized plan, exactly the contract of the k3/k4 centroid
    * materialization. The earlier one-row crossJoin formulation attached
    * the filter as a COLUMN, and every surviving probe row materialized a
    * copy of the 512 KB binary — measured 13 s at sf0.1 vs ~1 s as a
    * literal. (Eager consequence: calling this runs the build-side
    * aggregation immediately, like any runtime-filter build phase.)
    */
  def bloomPrunedSemiJoin(
      fact: DataFrame,
      build: DataFrame,
      factKey: String,
      buildKey: String,
      numBits: Int = 1 << 22,
      numHashes: Int = 7): DataFrame = {
    graft.functions.GraftFunctions.register(fact.sparkSession)
    val bloomBytes = build
      .agg(expr(s"graft_bloom($buildKey, $numBits, $numHashes)").as("__bloom"))
      .collect()(0).getAs[Array[Byte]](0)
    val pruned = fact.filter(
      call_function("graft_bloom_contains", lit(bloomBytes), col(factKey)))
    pruned.join(build, col(factKey) === col(buildKey), "left_semi")
  }

  /** Snapshot diff (J9) — CDC changelog EXTRACTION, the inverse of [[upsert]]
    * and the feed for [[scd2Historize]]: given two keyed versions of a
    * table, emit exactly the rows that changed as an (op, key, payload)
    * changelog — `I` new-only keys, `D` old-only keys, `U` keys present in
    * both whose payload differs (null-safe struct compare, so null→value
    * and value→null edits count). Unchanged rows emit nothing, which is
    * the point: downstream consumers process O(changes), not O(table).
    *
    * Shape: ONE full-outer shuffle join on the key (both sides collapse to
    * (key, payload-struct) first, so the wire carries each row once);
    * payload equality is a single codegen'd struct `<=>`. For `U`/`I` the
    * payload is the NEW side, for `D` the final OLD image.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String): DataFrame = {
    require(oldDf.columns.sameElements(newDf.columns),
      "snapshotDiff expects identical schemas " +
        s"(old: ${oldDf.columns.mkString(",")}, new: ${newDf.columns.mkString(",")})")
    val payload = oldDf.columns.filterNot(_ == keyCol).toSeq
    val o = oldDf.select(col(keyCol).as("__k"),
      struct(payload.map(col): _*).as("__old"))
    val n = newDf.select(col(keyCol).as("__k"),
      struct(payload.map(col): _*).as("__new"))
    o.join(n, Seq("__k"), "full_outer")
      .withColumn("op",
        when(col("__new").isNull, lit("D"))
          .when(col("__old").isNull, lit("I"))
          .when(!(col("__old") <=> col("__new")), lit("U")))
      .filter(col("op").isNotNull)
      .withColumn("__row", coalesce(col("__new"), col("__old")))
      .select(col("op") +: col("__k").as(keyCol) +:
        payload.map(p => col(s"__row.$p").as(p)): _*)
  }

  /** Interval coalescing (J8) — the gaps-and-islands operator: merge each
    * key's overlapping-or-touching [start, end] intervals into maximal
    * contiguous coverage windows ("islands"), the primitive behind uptime
    * windows, customer-activity stretches, sensor coverage, CDC validity
    * compaction. Closed-interval semantics: `start == previous end` merges.
    *
    * Shape: ONE shuffle on the key; the new-island flag (start beyond the
    * running max of all previous ends) and the island number (prefix sum of
    * flags) are two frames over the SAME (key × (start, end)) sort — one
    * sort, j7's pattern — then a per-(key, island) aggregate that rides the
    * same partitioning. Bounds are plain integers (epoch micros by
    * convention), so every comparison is engine-exact. Equal (start, end)
    * duplicates are order-insensitive by construction: a row whose start
    * lies inside ANY earlier interval of its island can never open a new
    * one, whichever side of the tie it sorts on.
    */
  def intervalCoalesce(
      intervals: DataFrame,
      keyCol: String = "key",
      startCol: String = "start",
      endCol: String = "end"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    intervals
      .withColumn("__ni",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("__ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island"))
      .agg(
        min(col(startCol)).as("window_start"),
        max(col(endCol)).as("window_end"),
        count(lit(1)).as("n_intervals"))
  }
}
