package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native expression: the full `n`-permutation MinHash signature of one
  * shingle-hash array in a single codegen'd pass.
  *
  * The declarative form explodes every (doc, shingle) pair into a row and
  * runs n simultaneous `min` aggregates through a shuffle; the signature is
  * a pure per-document function, so all n·|sh| affine-permute-and-min steps
  * run here as a tight primitive loop — map-only, no exploded relation, no
  * exchange.
  *
  * Arithmetic is EXACTLY the SQL formulation's, term for term
  * (pinned in spec): h = pmod(v, P), then min over shingles of
  * (a_i·h + b_i) % P, with P = 2³¹−1 (Mersenne) and the Knuth-constant
  * coefficient family a_i = 2654435761·(i+1) mod P (1 if 0),
  * b_i = (40503·(i+1)² + 1) mod P. All operands non-negative and
  * < 2⁶², so Java `%` equals SQL `%` here. Empty input yields
  * Long.MaxValue sentinels (callers filter empty shingle sets upstream).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires an array<bigint> argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      MinHashSignature.compute(a.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.functions.MinHashSignature.compute($a, $numHashes));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** Mersenne prime 2³¹−1 — the permutation modulus. */
  val P: Long = 2147483647L

  /** Deterministic affine coefficients — identical to Dedup.hashCoeffs. */
  def coeffs(n: Int): (Array[Long], Array[Long]) = {
    val as = new Array[Long](n)
    val bs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val a = (2654435761L * (i + 1)) % P
      as(i) = if (a == 0L) 1L else a
      bs(i) = (40503L * (i + 1) * (i + 1) + 1) % P
      i += 1
    }
    (as, bs)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** Shared by interpreted eval and generated code. */
  def compute(sh: ArrayData, numHashes: Int): Array[Long] = {
    val (as, bs) = cache.computeIfAbsent(numHashes, coeffs)
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = sh.numElements()
    var s = 0
    while (s < n) {
      val v = sh.getLong(s)
      val h = ((v % P) + P) % P  // pmod
      var i = 0
      while (i < numHashes) {
        val x = (as(i) * h + bs(i)) % P
        if (x < out(i)) out(i) = x
        i += 1
      }
      s += 1
    }
    out
  }
}
