package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: winnowing fingerprints (Schleimer/Wilkerson/Aiken,
  * the MOSS algorithm) of one document in a single per-row pass — the
  * distinct minima of a `w`-hash sliding window over the ordered 3-word
  * shingle md5 sequence.
  *
  * The declarative form materializes the hash array, then evaluates
  * `array_min(slice(hs, j, w))` per window through the interpreted HOF
  * path — O(windows · w) boxed comparisons plus a slice allocation per
  * window. Here the shingle digests and the sliding minima run in one
  * primitive loop; the comparison is on lowercase-hex strings, identical
  * to Spark's binary UTF8 string ordering on md5() output.
  *
  * Semantics EXACTLY match the SQL form (pinned in spec): tokens =
  * split(text, ' ') with trailing empties kept; < 3 tokens or fewer than
  * `w` windows ⇒ empty; fingerprints de-duplicated keeping first
  * occurrence order.
  */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(a: Any): Any =
    WinnowFingerprints.compute(a.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, w: Int): GenericArrayData = {
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < 3) return new GenericArrayData(Array.empty[Any])
    val nSh = tokens.length - 2
    if (nSh < w) return new GenericArrayData(Array.empty[Any])
    val digest = md.get()
    val hs = new Array[String](nSh)
    var i = 0
    while (i < nSh) {
      digest.reset()
      val shingle = tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2)
      val h = digest.digest(shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = HEX((h(b) >> 4) & 0xf)
        hex(b * 2 + 1) = HEX(h(b) & 0xf)
        b += 1
      }
      hs(i) = new String(hex)
      i += 1
    }
    // distinct window minima, first-occurrence order (= array_distinct)
    val out = new java.util.LinkedHashSet[String]()
    var j = 0
    val nWin = nSh - w + 1
    while (j < nWin) {
      var m = hs(j)
      var k = j + 1
      while (k < j + w) {
        if (hs(k).compareTo(m) < 0) m = hs(k)
        k += 1
      }
      out.add(m)
      j += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(arr)
  }
}
