package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provisioned parquet tables (TESTDATA.md).
  *
  * In the reference every relation lives in one ClickHouse database
  * (`/root/reference/backend/main.py:41`); here a "database" is a directory of
  * parquet tables. Reads are plain `spark.read.parquet` so Catalyst/Parquet
  * column pruning and predicate pushdown apply unchanged — at 100 TB these
  * directories would be partitioned/bucketed table roots and the same code
  * path still holds.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast in any realistic deployment (dimension
    * tables; region/nation are bounded by geography, not scale factor).
    */
  val broadcastable: Set[String] = Set("region", "nation")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(path(dir, name))

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others —
    * real parquet writers disagree on the physical timestamp unit constantly,
    * so the loader probes the scan schema and adapts ([[normalizeEventsTs]])
    * instead of assuming one unit. The reference never assumes a unit either:
    * its loader passes ClickHouse types through opaquely
    * (`/root/reference/backend/main.py:141-147`) and maps dtypes on import
    * (`:250-256`).
    *
    * The nanosAsLong conf is what makes a NANOS file readable at all (Spark's
    * vectorized reader rejects it otherwise) and is a no-op for micros files.
    * It is deliberately set session-wide and NOT restored: parquet
    * footer→Spark schema conversion re-runs on executors when the scan
    * actually executes, so flipping the conf back before the action would
    * fail the job (also set by [[Engine.session]]).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(spark.read.parquet(path(dir, "events")))
  }

  /** Normalize whatever physical representation `ts` arrived in to ONE
    * canonical type: a microsecond `TimestampType` (the session time zone is
    * pinned UTC engine-wide, so the NTZ→LTZ cast is value-preserving and
    * agrees with DuckDB's µs naive timestamps).
    *
    *  - `LongType` — TIMESTAMP(NANOS) surfaced under nanosAsLong → exact
    *    integer `div 1000`. `/` would be double division: at epoch-nano
    *    magnitude (~1.7e18) the rounding lands 1 µs off for a visible
    *    fraction of rows.
    *  - `TIMESTAMP_NTZ` — TIMESTAMP(MICROS, isAdjustedToUTC=false) → cast.
    *  - `TimestampType` — already canonical.
    *
    * Works identically on batch and streaming frames — the streaming staging
    * and direct readers ([[graft.streaming.EventsStream]]) share it so stream
    * and batch agree to the microsecond whatever the file carries.
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported physical type $other " +
          "(expected nanos long, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }

  /** Register every table as a temp view so `spark.sql`/`expr` can resolve
    * bare names — mirrors the reference's implicit single-database scope.
    *
    * Memoized per (session, dir): re-registering reads every table's parquet
    * footer again (~5s of pure metadata at sf0.1), which misstates the cost
    * of catalog probes that call this defensively. Switching dirs — or any
    * view having been dropped/shadowed since — re-registers (the existence
    * probe is a pure catalog lookup, no footer reads), so callers that drop
    * temp views between calls still see a complete database.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val fresh = lastRegisteredDir.get(spark) == dir &&
      all.forall(n => spark.catalog.tableExists(n))
    if (!fresh) {
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      lastRegisteredDir.put(spark, dir)
    }
  }

  private val lastRegisteredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Expected POST-LOAD shape of every driver table, as (column →
    * `DataType.simpleString`). This is the engine's input contract: round 9
    * lost 24 queries to a silent testdata regeneration (events.ts
    * NANOS→MICROS) because nothing compared the actual schemas against the
    * expected ones in one place. Timestamp columns are pinned as
    * `"timestamp"`; [[contractDiagnostics]] treats `timestamp` and
    * `timestamp_ntz` as equivalent (same µs payload, session TZ is UTC) so
    * only UNIT/type drift is flagged, not tz-annotation churn.
    */
  val expectedSchemas: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq(
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))

  private val tsLike = Set("timestamp", "timestamp_ntz")

  /** Data-contract smoke check: load each table and diff its actual schema
    * against [[expectedSchemas]]. Returns one `[contract]` diagnostic line
    * per drift (empty = clean); a table that fails to load at all yields one
    * line too. Verify and Bench print these at startup so a future testdata
    * regeneration produces ONE actionable diagnostic instead of dozens of
    * scattered per-query failures. Footer-only reads — no data scanned.
    */
  def contractDiagnostics(spark: SparkSession, dir: String): Seq[String] =
    all.flatMap { t =>
      expectedSchemas.get(t) match {
        case None =>
          // Fail-soft: a table registered in `all` without a schema entry is
          // itself a contract drift, not a reason to crash the diagnostic.
          Seq(s"[contract] $t: no expected schema registered")
        case Some(want) => diagnoseTable(spark, dir, t, want)
      }
    }

  private def diagnoseTable(
      spark: SparkSession, dir: String, t: String,
      want: Seq[(String, String)]): Seq[String] = {
      try {
        val got = load(spark, dir, t).schema
          .map(f => f.name -> f.dataType.simpleString)
        if (got.map(_._1) != want.map(_._1))
          Seq(s"[contract] $t: columns (${got.map(_._1).mkString(", ")}) " +
            s"!= expected (${want.map(_._1).mkString(", ")})")
        else got.zip(want).collect {
          case ((n, g), (_, w)) if g != w && !(tsLike(g) && tsLike(w)) =>
            s"[contract] $t.$n: $g != expected $w"
        }
      } catch {
        case e: Exception =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          Seq(s"[contract] $t: load failed: ${msg.linesIterator.next()}")
      }
  }
}
