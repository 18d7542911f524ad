package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitionedTablesSpec extends SparkSpec {

  private def partitions(root: String): Set[String] =
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
      .map(_.getName.stripPrefix("event_date="))
      .toSet

  test("dropPartitionsBefore: directory-level TTL, survivors intact, non-partitions untouched") {
    // private mutable copy — never the memoized shared staging
    val root = tmpDir("graft_retention") + "/events"
    PartitionedTables.writePartitioned(spark, sf, root)
    val before = partitions(root)
    assert(before.size > 2, s"fixture needs several partitions, got $before")
    val dates = before.toSeq.sorted
    val cutoff = dates(dates.size / 2)
    val expectDropped = dates.count(_ < cutoff)

    val dropped = PartitionedTables.dropPartitionsBefore(root, cutoff)
    assert(dropped == expectDropped, s"dropped $dropped, want $expectDropped")
    assert(partitions(root) == before.filter(_ >= cutoff))
    // _SUCCESS (a non-partition child) must survive the sweep
    assert(new java.io.File(root, "_SUCCESS").exists())

    // surviving data still reads, and equals the ts-filtered original
    val got = spark.read.parquet(root)
      .selectExpr("event_id").orderBy("event_id").collect().map(_.getLong(0))
    val want = Tables.load(spark, sf, "events")
      .filter(to_date(col("ts")) >= lit(cutoff).cast("date"))
      .selectExpr("event_id").orderBy("event_id").collect().map(_.getLong(0))
    assert(got.sameElements(want), "retention dropped or kept the wrong rows")

    // idempotent: second sweep at the same cutoff is a no-op
    assert(PartitionedTables.dropPartitionsBefore(root, cutoff) == 0)
  }
}
