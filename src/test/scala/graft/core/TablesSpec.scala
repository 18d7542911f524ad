package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

class TablesSpec extends SparkSpec {

  test("events ts normalizes to a µs TimestampType whatever the file carries") {
    // The engine's input contract is probe-and-adapt (round 9: testdata
    // regenerated events.ts from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and
    // a hardcoded nanos assumption killed 24 queries): whatever physical
    // unit the driver's file carries, the loaded frame is canonical.
    val loaded = Tables.load(spark, sf, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    assert(loaded.count() > 0)
  }

  test("normalizeEventsTs: nanos-long path is exact integer truncation") {
    // Synthesize the nanos-long shape (how TIMESTAMP(NANOS) surfaces under
    // nanosAsLong) and pin exact ns→µs integer division — the ADVICE.md
    // high finding: `/` is double division and lands 1µs off at epoch-nano
    // magnitude (~1.7e18).
    val raw = spark.range(10000).select(
      col("id").as("event_id"),
      (lit(1705363200000000000L) + col("id") * lit(999999937L)).as("ts"))
    assert(raw.schema("ts").dataType == LongType)
    val conv = Tables.normalizeEventsTs(raw)
    assert(conv.schema("ts").dataType == TimestampType)
    val bad = conv
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .join(raw.select(col("event_id"), col("ts").as("ts_ns")), "event_id")
      .filter(expr("ts_us != ts_ns div 1000"))
      .count()
    assert(bad == 0L, s"$bad rows with inexact ns→µs conversion")
  }

  test("normalizeEventsTs: NTZ micros path is a value-preserving cast (UTC)") {
    val raw = spark.range(1000).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1705363200000000L) + col("id") * lit(999999937L))
        .cast(TimestampNTZType).as("ts"))
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val conv = Tables.normalizeEventsTs(raw)
    assert(conv.schema("ts").dataType == TimestampType)
    val bad = conv
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .join(
        raw.select(col("event_id"),
          unix_micros(col("ts").cast(TimestampType)).as("want_us")),
        "event_id")
      .filter(expr("ts_us != want_us"))
      .count()
    assert(bad == 0L, s"$bad rows drifted through the NTZ→LTZ cast")
  }

  test("loadEvents leaves nanosAsLong set; repeated loads are idempotent") {
    // nanosAsLong is deliberately session policy (see loadEvents doc); pin
    // that loading events leaves it set so NANOS-generation scans execute,
    // and that repeated loads are idempotent.
    Tables.load(spark, sf, "events").count()
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    Tables.load(spark, sf, "events").count() // still readable
  }

  test("contractDiagnostics is clean on the driver's own testdata") {
    val diags = Tables.contractDiagnostics(spark, sf)
    assert(diags.isEmpty, diags.mkString("\n"))
  }

  test("contractDiagnostics flags a missing table loudly, not fatally") {
    val dir = TempDirs.create("graft_contract_spec_")
    // stage a dir with only region present — nine tables should each yield
    // exactly one [contract] line, none should throw
    Tables.load(spark, sf, "region").write.mode("overwrite")
      .parquet(s"$dir/region.parquet")
    val diags = Tables.contractDiagnostics(spark, dir)
    assert(diags.size == Tables.all.size - 1, diags.mkString("\n"))
    assert(diags.forall(_.startsWith("[contract] ")))
  }
}
