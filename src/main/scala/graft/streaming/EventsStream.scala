package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming ingest over the events table (north-star extension,
  * SURVEY.md §7.4): the streaming twin of
  * [[graft.operators.Analytics.eventsHourly]].
  *
  * Shapes:
  *  - file source with an explicit schema (streaming reads never infer);
  *    the parquet TIMESTAMP(NANOS) column arrives as long under the
  *    nanosAsLong conf and is converted with the same exact integer
  *    `div 1000` as the batch path (`graft.core.Tables.loadEvents`), so
  *    stream and batch agree to the microsecond;
  *  - [[hourlyAggregate]] is the complete-mode tumbling aggregate used for
  *    the replay/backfill path (Trigger.AvailableNow: process everything
  *    already on disk, then stop — Spark's batch-equivalent streaming mode);
  *  - [[hourlyWindowedWatermarked]] is the 24/7 shape: watermark-bounded
  *    state in append mode — state per (window x event_type) only until the
  *    watermark passes the window end, which is what keeps a 100 TB/day
  *    stream's state finite. Late-data semantics are pinned in
  *    StreamingSpec with a MemoryStream.
  */
object EventsStream {

  /** Raw schema of events.parquet with ts as nanos-since-epoch long (how the
    * scan surfaces TIMESTAMP(NANOS) under `parquet.nanosAsLong`).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over the events parquet file(s) in `dir`, ts converted
    * to a microsecond timestamp exactly as the batch loader does.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source's basePath must be a DIRECTORY; select the events
    // file(s) within the sf dir via glob filter
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Hourly tumbling aggregate, identical to the batch
    * [[graft.operators.Analytics.eventsHourly]] frame (exact integer
    * milli-quantized sum).
    */
  def hourlyAggregate(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))

  /** Watermarked, windowed, append-mode variant — the unbounded-stream shape:
    * only windows older than the watermark are emitted (finalized), state is
    * evicted past the watermark, and late rows beyond it are dropped.
    */
  def hourlyWindowedWatermarked(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(
        col("window.start").as("hour"), col("event_type"),
        col("n"), col("value_milli"))

  /** Per-user sessionization: events separated by less than `gap` of
    * inactivity merge into one session (`session_window` — state per OPEN
    * session only once watermarked, the bounded-state shape for clickstream
    * sessionization at scale). Works identically on batch frames, which is
    * how [[graft.SparkEntry]] oracle-gates it: DuckDB reproduces the gap
    * semantics with a lag()-based session id.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("value_milli"))

  /** Replay the on-disk events through the streaming engine with
    * Trigger.AvailableNow into a memory sink and return the final aggregate
    * as a materialized batch frame. The sink's temp view is dropped before
    * returning so catalog listings stay deterministic.
    */
  def hourlyAvailableNow(
      spark: SparkSession,
      dir: String,
      queryName: String = "graft_events_hourly_stream"): DataFrame = {
    val q = hourlyAggregate(readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      val rows = spark.table(queryName).collect().toIndexedSeq
      val schema = spark.table(queryName).schema
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    } finally {
      // always drop — a leaked sink view would poison catalog listings
      spark.catalog.dropTempView(queryName)
      ()
    }
  }
}
