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
    * convert to a microsecond timestamp — the same truncation DuckDB applies
    * (its timestamps are µs), so oracle comparisons agree.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }

  /** Register every table as a temp view so `spark.sql`/`expr` can resolve
    * bare names — mirrors the reference's implicit single-database scope.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
