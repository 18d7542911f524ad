package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the SORTED-DISTINCT xxhash64 set of a document's
  * n-word shingles in one per-row pass — the set representation MinHash
  * near-dedup signs and verifies against.
  *
  * Bit-identical (pinned in spec) to the declarative two-HOF-pass form
  *   `th = transform(split(text, ' '), w -> xxhash64(w))`
  *   `array_sort(array_distinct(transform(sequence(0, size(th) − n),
  *      i -> xxhash64(th[i], …, th[i+n−1]))))`
  * : per-token hashes are XXH64 over UTF-8 bytes with Spark's seed 42, and
  * the variadic combine replicates Spark's left-to-right seed chaining
  * (`hashLong(arg_k, …hashLong(arg_0, 42)…)`). Each token is hashed ONCE,
  * each shingle is n chained `hashLong` steps — no interpreted lambda
  * dispatch, no intermediate arrays; sort + dedup on primitive longs.
  * Documents with fewer than n tokens yield an empty set. Output sorted
  * ascending — the [[SortedIntersectSize]] precondition.
  */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      WordShingleHashes.compute(a.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.functions.WordShingleHashes.compute($a, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashes {

  private val Seed = 42L // Spark's xxhash64 seed

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): Array[Long] = {
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < n) return Array.emptyLongArray
    val th = new Array[Long](tokens.length)
    var t = 0
    while (t < tokens.length) {
      val b = tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      th(t) = XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, Seed)
      t += 1
    }
    val count = tokens.length - n + 1
    val raw = new Array[Long](count)
    var i = 0
    while (i < count) {
      // variadic xxhash64(th_i, …, th_{i+n-1}): left-to-right seed chaining
      var h = Seed
      var k = 0
      while (k < n) { h = XXH64.hashLong(th(i + k), h); k += 1 }
      raw(i) = h
      i += 1
    }
    java.util.Arrays.sort(raw)
    var w = 0
    var r = 1
    while (r < count) {
      if (raw(r) != raw(w)) { w += 1; raw(w) = raw(r) }
      r += 1
    }
    if (w + 1 == count) raw else java.util.Arrays.copyOf(raw, w + 1)
  }
}
