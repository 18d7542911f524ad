package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join shapes Spark's built-in operators lack, composed from the primitives
  * Catalyst optimizes well (north-star extension, SURVEY.md §7.4 — the
  * reference's join surface is comma-joins only, `backend/main.py:176-180`).
  *
  * Escalation-ladder note (SURVEY §2 preamble): these are case (a) — the
  * semantics compose from existing operators (union + window), so no custom
  * LogicalPlan/Strategy is justified.
  */
object Joins {

  /** As-of join: attach to every left row the LATEST right row whose
    * `tsCol` is ≤ the left row's, per `keyCol` (inclusive match, left-outer:
    * left rows with no prior right row keep nulls).
    *
    * Implementation is the union + last-carry-forward pattern, not a
    * per-left-row lookup: tag both sides, union, and carry the right payload
    * with `last(ignoreNulls)` over (key ORDER BY ts, side, seq) ROWS
    * UNBOUNDED PRECEDING. That is ONE shuffle on the key and a single
    * sequential pass per key partition — at 100 TB it scales exactly like
    * any keyed window (state is one carried struct per partition stream),
    * where the naive range join (left × right on key with ts ≤, then argmax)
    * explodes quadratically per key.
    *
    * Determinism: the window order (ts, side, seq) is a TOTAL order when
    * `seqCol` is unique per side — right rows sharing (key, ts) resolve to
    * the largest seq, and a right row tying a left row's ts sorts first
    * (side 0 < 1), which yields the inclusive ≤ semantics.
    *
    * Output = `leftCols` as-is plus `rightCols` renamed with `rightPrefix`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      leftCols: Seq[String],
      rightCols: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    val lt = StructType(left.select(leftCols.map(col): _*).schema.fields)
    val rt = StructType(right.select(rightCols.map(col): _*).schema.fields)
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(seqCol).cast("long").as("__seq"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lpay"),
      lit(null).cast(rt).as("__rpay"))
    val r = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(seqCol).cast("long").as("__seq"), lit(0).as("__side"),
      lit(null).cast(lt).as("__lpay"),
      struct(rightCols.map(col): _*).as("__rpay"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__lpay.$c").as(c)) ++
          rightCols.map(c => col(s"__match.$c").as(s"$rightPrefix$c")): _*)
  }
}
