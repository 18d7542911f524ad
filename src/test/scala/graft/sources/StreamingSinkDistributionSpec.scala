package graft.sources

import graft.SparkSpec
import graft.core.ManifestTable
import org.apache.spark.sql.functions._

/** The native streaming sink inherits [[GraftWrite]]'s clustered+sorted
  * distribution (round 18): Spark's micro-batch planner applies
  * RequiresDistributionAndOrdering to the epoch write, so a
  * high-cardinality partition column lands ONE file per leaf per epoch
  * instead of thrashing the LRU writer cap into one file per few rows —
  * the same law the batch write pins, proven on the streaming road.
  */
class StreamingSinkDistributionSpec extends SparkSpec {

  import spark.implicits._

  test("streaming sink: 40 leaves under a 4-writer cap land one file per leaf per epoch, rows exact") {
    val root = tmpDir("graft_stream_dist") + "/t"
    val src = tmpDir("graft_stream_dist_src")
    // seed at fence -1 so epoch 0 is not fenced out
    ManifestTable.commit(spark, root,
      Seq((-1L, "seed")).toDF("k", "part"), "part", batchId = -1L)
    val rows = (0 until 200).map(i => (i.toLong, s"p${i % 40}"))
    rows.toDF("k", "part")
      .repartition(1).write.parquet(src + "/in")
    val q = spark.readStream.schema("k LONG, part STRING")
      .parquet(src + "/in")
      .writeStream.format("graft-manifest")
      .option("path", root)
      .option("maxOpenWriters", "4")
      .option("checkpointLocation", src + "/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val v = ManifestTable.currentVersion(spark, root)
    val files = ManifestTable.readManifest(spark, root, v)._1
    assert(files.size == 41,
      s"epoch write must land one file per leaf (+1 seed): ${files.size}")
    val got = ManifestTable.read(spark, root).get
      .filter(col("k") >= 0).select("k", "part").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == rows.toSet, "rows lost or duplicated through the sink")
  }
}
