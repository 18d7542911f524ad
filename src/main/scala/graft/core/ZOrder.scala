package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two integer
  * dimensions and range-partition + sort files by the interleaved value, so
  * every file covers a small RECTANGLE of the 2-d key space instead of a
  * stripe. Parquet keeps per-file/row-group min/max for both columns; a
  * reader with a predicate on EITHER dimension (or a 2-d box) can then skip
  * most files — the property a linear sort only provides for its leading
  * column. This is the layout move behind Delta/Iceberg `ZORDER BY`,
  * expressed engine-level (north-star extension; the physical-layout
  * sibling of [[Compaction]] and [[Bucketing]]).
  *
  * Like U1/J4/J5 this is a physical-layout utility with no value-level
  * oracle surface: the row set is identical by construction (spec-pinned),
  * what changes is which files a predicate must touch (also spec-pinned,
  * via exactly the per-file min/max stats a scan planner consults).
  */
object ZOrder {

  /** Morton value of two non-negative ints, `bits` bits each, as one SQL
    * expression (a fold over the bit positions — integer shifts/masks only,
    * stays inside codegen; no UDF, no custom Expression needed for a value
    * consumed only by repartition/sort).
    *
    * The documented domain ([0, 2^bits) on both dimensions) is ENFORCED,
    * not assumed: a negative value sign-extends through `>> b & 1` and a
    * too-large one aliases with (value mod 2^bits) — both keep every row
    * but silently destroy the rectangle/locality property the layout
    * exists for, a corruption no row-level check downstream would ever
    * catch. An out-of-domain row therefore FAILS the write (codegen'd
    * assert_true, null when the bound holds — the coalesce keeps it in
    * the plan), telling the caller to shift/scale the dimension first.
    */
  def zValue(xCol: String, yCol: String, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val lim = 1L << bits
    expr(
      s"""aggregate(
            sequence(0, ${bits - 1}),
            0L,
            (acc, b) -> acc
              + shiftleft(CAST($xCol AS BIGINT) >> b & 1, 2 * b)
              + shiftleft(CAST($yCol AS BIGINT) >> b & 1, 2 * b + 1))
          + coalesce(
              CAST(assert_true(
                $xCol >= 0 AND $xCol < ${lim}L AND $yCol >= 0 AND $yCol < ${lim}L,
                'zValue: dimension value outside [0, 2^$bits) — negative or oversized inputs would silently break the Morton locality; shift/scale the column first') AS BIGINT),
              0L)""")
  }

  /** Write `df` z-ordered on (xCol, yCol) into ~`nFiles` files: range
    * partition by the Morton value (one shuffle — contiguous curve segments
    * per file) and sort within each file so row-group stats inside a file
    * are tight too. Columns are passed through unchanged.
    */
  def writeZOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      outDir: String,
      nFiles: Int,
      bits: Int = 16): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    val z = zValue(xCol, yCol, bits)
    df.repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file (min, max) envelopes of both dimensions — the statistics a
    * scan planner consults for skipping. Exposed for the spec and for
    * layout audits.
    */
  def fileEnvelopes(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
}
