package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: all `bits` hyperplane projections of one
  * array<double> vector in a single codegen'd pass, floor-quantized (1e7)
  * to exact integers.
  *
  * This replaces the only shuffle in random-hyperplane LSH signature
  * computation: the declarative formulation (posexplode dims → broadcast
  * join with the (bits × dim) sign table → groupBy (id, bit) partial sums)
  * materializes n·dim·bits intermediate rows — ~46M at sf0.1 — before the
  * aggregate collapses them. Here the same bits·dim multiply-adds run as a
  * tight primitive loop INSIDE whole-stage codegen, map-only: no exploded
  * rows, no shuffle, no per-element HOF dispatch. (An unrolled ±term
  * projection per bit was measured 2.5× slower — it blows the JVM method
  * size and falls out of codegen; a loop over a referenced sign array stays
  * compact at any bits × dim.)
  *
  * Quantization uses `floor`, not `round`: floor of a double is bit-exact
  * in every engine (pure FP operation, no decimal-string interpretation),
  * so the per-bit INTEGER sums — and therefore the sign bits — are
  * reproducible across Spark, this loop, and the DuckDB oracle in any
  * accumulation order. The sign matrix is md5-derived ([[HyperplaneSums.signs]]:
  * sign(b, d) = +1 iff the first hex digit of md5("b_d") < '8'), identical
  * on every engine with no RNG state.
  *
  * Missing trailing dims read as absent (vectors shorter than `dim`
  * contribute only their present elements); elements are assumed non-null
  * (embedding vectors by construction).
  */
case class HyperplaneSums(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hp_sums requires an array<double> argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hp_sums"

  @transient private lazy val signs: Array[Double] =
    HyperplaneSums.signs(bits, dim)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](bits)
    var b = 0
    while (b < bits) {
      var s = 0L
      val off = b * dim
      var d = 0
      while (d < n) {
        s += math.floor(signs(off + d) * v.getDouble(d) * 1.0e7).toLong
        d += 1
      }
      out(b) = s
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $out = new long[$bits];
         |for (int $b = 0; $b < $bits; $b++) {
         |  long $s = 0L;
         |  int $off = $b * $dim;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += (long) java.lang.Math.floor($signsRef[$off + $d] * $a.getDouble($d) * 1.0E7D);
         |  }
         |  $out[$b] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSums {

  /** Deterministic ±1 hyperplane matrix, row-major (bit-th row, dim-wide):
    * sign(b, d) = +1 iff the first hex digit of md5("b_d") is < '8' —
    * reproducible in SQL on any engine (see the k2 oracle), no RNG state.
    */
  def signs(bits: Int, dim: Int): Array[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Double](bits * dim)
    var b = 0
    while (b < bits) {
      var d = 0
      while (d < dim) {
        val hex = digest.digest(s"${b}_$d".getBytes("UTF-8"))
        out(b * dim + d) = if ((hex(0) & 0x80) == 0) 1.0 else -1.0
        d += 1
      }
      b += 1
    }
    out
  }
}
