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
/** Typed state for [[EventsStream.userRunningTotals]]. */
final case class UserTotals(n: Long, valueMilli: Long)

object EventsStream {

  /** Output/checkpoint scratch dirs — JVM-exit-cleaned via
    * [[graft.core.TempDirs]] (shared with the source round-trip entries).
    */
  private def tempDir(prefix: String): String =
    graft.core.TempDirs.create(prefix)

  /** Schema of the hourly aggregate frames, for reading the sink output back
    * without inference — a zero-batch run leaves the sink dir empty, where
    * schema inference would throw; an explicit schema yields an empty frame.
    */
  val hourlySchema: StructType = StructType(Seq(
    StructField("hour", TimestampType),
    StructField("event_type", StringType),
    StructField("n", LongType),
    StructField("value_milli", LongType)))

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

  /** Per-user running totals via explicit typed state
    * (`mapGroupsWithState`) — the custom-state streaming shape for logic
    * windowed aggregates can't express (counters, ML feature state,
    * session-scoped models). State is one [[UserTotals]] per key, updated
    * per micro-batch and emitted in Update mode; at scale the state store
    * is partitioned by the (high-cardinality) user key, so per-task state
    * stays bounded. Production deployments add a timeout
    * (`GroupStateTimeout.ProcessingTimeTimeout` + `state.remove()`) to
    * retire idle keys; the replay/backfill form here keeps all keys live.
    * Works identically on a batch Dataset (tested both ways —
    * EventsStreamSpec pins the streaming semantics with a MemoryStream).
    */
  def userRunningTotals(
      events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events
      .selectExpr("user_id", "CAST(round(value * 1000) AS BIGINT) AS vm")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(0L, 0L))
          var n = prev.n
          var v = prev.valueMilli
          rows.foreach { r => n += 1; v += r._2 }
          state.update(UserTotals(n, v))
          (user, n, v)
      }
      .toDF("user_id", "n_events", "value_milli")
  }

  /** Replay the on-disk events through the streaming engine with
    * Trigger.AvailableNow and return the final aggregate as a batch frame.
    *
    * Complete-mode aggregates can't use the built-in file sink (append-only),
    * so the sink is `foreachBatch`: each micro-batch OVERWRITES a parquet
    * directory with the full updated aggregate, executor-parallel — nothing
    * ever transits the driver (a memory sink + collect() would cap this at
    * driver RAM; at the 100 TB point the aggregate is itself large). The
    * returned frame reads the last batch's parquet.
    */
  def hourlyAvailableNow(
      spark: SparkSession,
      dir: String,
      queryName: String = "graft_events_hourly_stream"): DataFrame = {
    val out = tempDir("graft_stream_out_")
    val ckpt = tempDir("graft_stream_ckpt_")
    val q = hourlyAggregate(readEvents(spark, dir))
      .writeStream
      .queryName(queryName)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(out)
      }
      .start()
    q.awaitTermination()
    spark.read.schema(hourlySchema).parquet(out)
  }

  /** Replay the on-disk events through the WATERMARKED append-mode aggregate
    * ([[hourlyWindowedWatermarked]]) with Trigger.AvailableNow into a real
    * file sink — the 24/7 production shape, run in backfill mode.
    *
    * Append mode emits only FINALIZED windows: with the watermark ending at
    * max(event ts) − delay, windows that end after it are still open when
    * the replay stops and are withheld. The deterministic contract (oracle-
    * gated as `st3`): emitted = exactly the hourly windows whose end ≤
    * max(ts) − delay.
    */
  def hourlyWatermarkedAvailableNow(
      spark: SparkSession,
      dir: String,
      delay: String = "1 hour",
      queryName: String = "graft_events_hourly_wm"): DataFrame = {
    val out = tempDir("graft_stream_wm_out_")
    val ckpt = tempDir("graft_stream_wm_ckpt_")
    val q = hourlyWindowedWatermarked(readEvents(spark, dir), delay)
      .writeStream
      .queryName(queryName)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema(hourlySchema).parquet(out)
  }
}
