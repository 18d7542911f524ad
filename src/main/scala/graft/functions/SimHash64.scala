package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the complete 64-bit SimHash of a document in ONE
  * map-only pass — bit j = sign of Σ over DISTINCT whitespace tokens of
  * (2·bit_j(md5(token)) − 1), emitted as a 64-char '0'/'1' bitstring.
  *
  * The declarative formulation (explode distinct tokens → md5 column →
  * 16-nibble posexplode → ×4 bit explode → groupBy (id, pos) → groupBy id)
  * shuffles 64 rows per (doc, token) — ~48M rows at sf0.1 — to compute
  * per-bit integer sums that fit in one 64-slot array per document. Here
  * the token split, dedup, digests and bit accumulation all run inside a
  * single per-row call; the only remaining cost is the md5 per distinct
  * token, which is information-theoretically required.
  *
  * Semantics EXACTLY match the SQL form (and the DuckDB oracle):
  * tokenization is `split(text, ' ')` with trailing empties KEPT (Spark's
  * split keeps them; Java's default drops them — hence limit −1), token
  * identity is exact-string, md5 over UTF-8 bytes, per-bit sums are exact
  * integers, ties (sum = 0) emit '1'.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code — one implementation,
    * no dual-path drift.
    */
  def compute(text: UTF8String): UTF8String = {
    // limit -1: keep trailing empty tokens, matching Spark/DuckDB split
    val tokens = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](math.max(16, tokens.length * 2))
    val sums = new Array[Int](64)
    val digest = md.get()
    var t = 0
    while (t < tokens.length) {
      val w = tokens(t)
      if (seen.add(w)) {
        digest.reset()
        val h = digest.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var j = 0
        while (j < 64) {
          // bit j of the 128-bit digest's first 64 bits, MSB-first —
          // identical to the hex-nibble unpack in the SQL oracle
          if (((h(j >> 3) >> (7 - (j & 7))) & 1) == 1) sums(j) += 1
          else sums(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (sums(j) >= 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
