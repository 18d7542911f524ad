package graft.tools

import org.apache.spark.sql.functions._

/** Scan-throughput comparison: the DSv2 `graft-manifest` read vs the
  * Scala [[graft.core.ManifestTable.read]] path on the same committed
  * table — the round-16 columnar-read done-criterion (format ≤ 1.2× the
  * native-reader path on a full-scan aggregate at sf1 volume).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.ScanCompare"`
  * Commits the chosen sf dir's lineitem as a manifest table (16 buckets,
  * untimed), then times N alternating full-scan aggregates through both
  * paths and prints one JSON line with per-path minima (the BASELINE.md
  * variance protocol).
  */
object ScanCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.Engine.session(
      "graft-scan-compare", Some(s"local[$cpus]"))
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.core.TempDirs.create("graft_scan_cmp") + "/lineitem"
    // SPARK_GRAFT_MULT replicates the table N-fold (id-salted) so the
    // timed scan is seconds, not scheduler noise
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "1").toInt
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val li = base.crossJoin(spark.range(mult).select(col("id").as("__m")))
      .withColumn("l_orderkey", col("l_orderkey") * mult + col("__m"))
      .drop("__m")
      .withColumn("bucket", pmod(col("l_orderkey"), lit(32)).cast("int"))
    graft.core.ManifestTable.commit(spark, root, li, "bucket", batchId = 0L,
      statsCol = Some("l_orderkey"))
    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("l_returnflag")
        .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1)))
        .count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val fmtT = scala.collection.mutable.ArrayBuffer[Double]()
    val apiT = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to rounds) {
      fmtT += time(agg(spark.read.format("graft-manifest").load(root)))
      apiT += time(agg(graft.core.ManifestTable.read(spark, root).get))
    }
    println(s"""{"metric":"scan_compare","unit":"sec","rows":${li.count()},""" +
      s""""fmt_min":${fmtT.min},"api_min":${apiT.min},""" +
      s""""ratio":${fmtT.min / apiT.min},""" +
      s""""fmt":[${fmtT.mkString(",")}],"api":[${apiT.mkString(",")}]}""")
    spark.stop()
  }
}
