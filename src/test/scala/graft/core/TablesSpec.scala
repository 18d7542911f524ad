package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TablesSpec extends SparkSpec {

  test("events ts is exact ns→µs integer truncation (no double rounding)") {
    // Read the raw nanos column (long) and check every row's converted
    // timestamp equals exact integer division — the ADVICE.md high finding:
    // `/` is double division and lands 1µs off at epoch-nano magnitude.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(Tables.path(sf, "events"))
      .select(col("event_id"), col("ts").as("ts_ns"))
    val conv = Tables.load(spark, sf, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val bad = raw.join(conv, "event_id")
      .filter(expr("ts_us != ts_ns div 1000"))
      .count()
    assert(bad == 0L, s"$bad rows with inexact ns→µs conversion")
  }

  test("loadEvents leaves nanosAsLong set; repeated loads are idempotent") {
    // nanosAsLong is deliberately session policy (see loadEvents doc); pin
    // that loading events leaves it set so scans execute, and that repeated
    // loads are idempotent.
    Tables.load(spark, sf, "events").count()
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    Tables.load(spark, sf, "events").count() // still readable
  }
}
