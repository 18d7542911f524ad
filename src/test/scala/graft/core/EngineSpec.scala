package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EngineSpec extends SparkSpec {

  test("releaseCachedState drops memos and all persisted blocks") {
    // build a query that persists (dedup shingle sets) and memoizes (d2 pair
    // set via SparkEntry), then release and assert nothing stays pinned
    graft.SparkEntry.queries("d2_near_dedup")(spark, sf).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "fixture should have persisted blocks before release")
    Engine.releaseCachedState(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"blocks still pinned: ${spark.sparkContext.getPersistentRDDs.keys.mkString(", ")}")
    // the memoized pipeline stage must rebuild (and still be correct)
    val again = graft.SparkEntry.queries("d2_near_dedup")(spark, sf)
    assert(again.columns.toSeq == Seq("a_id", "b_id", "jaccard"))
  }

  test("releaseCachedState evicts staged scratch copies (streams + partitioned layout)") {
    // populate both JVM-wide staging memos, then release and assert the
    // memo maps are empty AND the scratch dirs are gone from disk
    graft.streaming.EventsStream.hourlyAvailableNow(spark, sf, "graft_engine_rel").frame.count()
    val partRoot = PartitionedTables.eventsByDateRoot(spark, sf)
    assert(graft.streaming.EventsStream.stagedCount > 0,
      "fixture should have staged a streaming source copy")
    assert(PartitionedTables.stagedCount > 0)
    Engine.releaseCachedState(spark)
    assert(graft.streaming.EventsStream.stagedCount == 0,
      "staged streaming copies must be evicted on release")
    assert(PartitionedTables.stagedCount == 0,
      "staged partitioned copies must be evicted on release")
    assert(!new java.io.File(partRoot).exists(),
      "released scratch dir must be deleted from disk, not just forgotten")
    // staging must transparently rebuild after a release
    assert(graft.streaming.EventsStream.hourlyAvailableNow(spark, sf, "graft_engine_rel2")
      .frame.count() > 0)
  }
}
