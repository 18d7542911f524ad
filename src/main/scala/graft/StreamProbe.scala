package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main for the streaming replay block (not part of the
  * driver contract; kept out of Bench/Verify). Runs each replay shape twice
  * in one JVM to separate first-run JIT/staging cost from steady-state.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n  batches=${graft.streaming.EventsStream.lastReplayBatches}")
    }
    for (round <- 1 to 3) {
      println(s"[probe] --- round $round ---")
      time("st1_hourly")(graft.streaming.EventsStream.hourlyAvailableNow(spark, sfDir).count())
      time("st3_watermarked")(graft.streaming.EventsStream.hourlyWatermarkedAvailableNow(spark, sfDir).count())
      time("st4_user_totals")(graft.streaming.EventsStream.userTotalsAvailableNow(spark, sfDir).count())
    }
    spark.stop()
  }
}
