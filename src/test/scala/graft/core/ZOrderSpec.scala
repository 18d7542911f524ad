package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue: interleaves bits (known Morton values)") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.zValue("x", "y", bits = 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // morton(5=101b, 3=011b): x bits at even positions, y at odd:
    //   x:1_0_1 -> 010001b(17)... computed: bit0=1,bit2=0,bit4=1 (x), bit1=1,bit3=1,bit5=0 (y)
    //   = 1 + 2 + 8 + 16 = 27
    assert(out == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("z-ordered layout: row-identical, and a y-only box touches far fewer files than a linear-by-x layout") {
    // 64x64 grid of keys — every (x, y) combination once
    val grid = spark.range(0, 64).select(col("id").as("x"))
      .crossJoin(spark.range(0, 64).select(col("id").as("y")))
      .withColumn("payload", col("x") * 1000 + col("y"))
    val zDir = tmpDir("graft_zorder_")
    val linDir = tmpDir("graft_linear_")
    val nFiles = 16
    ZOrder.writeZOrdered(grid, "x", "y", zDir, nFiles, bits = 8)
    grid.repartitionByRange(nFiles, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    // identical rows back
    val zBack = spark.read.parquet(zDir)
    assert(zBack.exceptAll(grid).isEmpty && grid.exceptAll(zBack).isEmpty)

    // files a y-predicate must touch, judged by the same per-file min/max
    // stats a scan planner consults
    def touchedByY(dir: String, yLo: Long, yHi: Long): Long =
      ZOrder.fileEnvelopes(spark.read.parquet(dir), "x", "y")
        .filter(col("y_max") >= yLo && col("y_min") <= yHi)
        .count()
    val zTouched = touchedByY(zDir, 8, 15)   // an 8-row y-band (1/8 of y)
    val linTouched = touchedByY(linDir, 8, 15)
    // linear-by-x: every file spans all y values -> touches ALL files;
    // z-order: the band intersects only the curve cells in that y stripe
    assert(linTouched == nFiles, s"linear layout expected to touch all files, got $linTouched")
    assert(zTouched * 2 <= nFiles,
      s"z-order should touch at most half the files for a 1/8 y-band, got $zTouched/$nFiles")
  }
}
