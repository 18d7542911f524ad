package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read nanos as long (legacy conf) and
    * convert to a microsecond timestamp with exact integer division (`div`)
    * — the same truncation DuckDB applies (its timestamps are µs), so oracle
    * comparisons agree. `/` would be double division: at epoch-nano magnitude
    * (~1.7e18) the rounding lands 1µs off for a visible fraction of rows.
    *
    * The conf is deliberately set session-wide and NOT restored: parquet
    * footer→Spark schema conversion re-runs on executors when the scan
    * actually executes, so flipping the conf back before the action would
    * fail the job. The conf only changes behavior for NANOS-typed parquet —
    * which is a hard error without it — so it is safe to leave on
    * (also set by [[Engine.session]]).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
}
