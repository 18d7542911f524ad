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
}
