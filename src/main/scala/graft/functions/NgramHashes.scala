package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the SORTED-DISTINCT xxhash64 set of a document's
  * character n-grams in one per-row pass — the set representation the
  * blocked-Jaccard dedup verifies against.
  *
  * Bit-identical to
  * `array_sort(array_distinct(transform(sequence(1, length(t) − n + 1),
  * i -> xxhash64(substring(t, i, n)))))` (pinned in spec): hashes are
  * XXH64 over the gram's UTF-8 bytes with Spark's seed 42. The declarative
  * form evaluates its lambda per gram through the interpreted HOF path and
  * allocates a substring per gram; here pure-ASCII text (the common case —
  * `numBytes == numChars`) hashes byte slices in place with ZERO per-gram
  * allocation, and multi-byte text falls back to exact per-char substrings.
  * Sort + dedup run on a primitive long array. Output sorted ascending —
  * the precondition [[SortedIntersectSize]] requires.
  */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_hashes requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  override def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      NgramHashes.compute(a.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.functions.NgramHashes.compute($a, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashes {

  private val Seed = 42L // Spark's xxhash64 seed

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): Array[Long] = {
    val chars = text.numChars()
    if (chars < n) return Array.emptyLongArray
    val count = chars - n + 1
    val raw = new Array[Long](count)
    if (text.numBytes() == chars) {
      // pure ASCII: char i is byte i — hash slices in place
      val base = text.getBaseObject
      val off = text.getBaseOffset
      var i = 0
      while (i < count) {
        raw(i) = XXH64.hashUnsafeBytes(base, off + i, n, Seed)
        i += 1
      }
    } else {
      var i = 0
      while (i < count) {
        val sub = text.substring(i, i + n)
        raw(i) = XXH64.hashUnsafeBytes(
          sub.getBaseObject, sub.getBaseOffset, sub.numBytes, Seed)
        i += 1
      }
    }
    java.util.Arrays.sort(raw)
    // in-place dedup of the sorted array
    var w = 0
    var r = 1
    while (r < count) {
      if (raw(r) != raw(w)) { w += 1; raw(w) = raw(r) }
      r += 1
    }
    if (w + 1 == count) raw else java.util.Arrays.copyOf(raw, w + 1)
  }
}
