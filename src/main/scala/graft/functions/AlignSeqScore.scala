package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: temporal-alignment score of two perceptual
  * hash SEQUENCES — the D14 video near-dup verify kernel.
  *
  * Inputs are flattened `array<bigint>` frame-hash sequences
  * (`wordsPerFrame` longs per frame, frame order). For every offset
  * `o ∈ [−maxOffset, maxOffset]` it counts aligned frame pairs
  * `(f, f+o)` whose Hamming distance (Σ bitCount over the frame's words)
  * is ≤ `maxHamming`, and returns `[best_offset, matched]` — the maximum
  * count and the SMALLEST offset achieving it (a total order, so the
  * result is deterministic).
  *
  * The declarative form — `transform(sequence(...), o -> size(filter(...,
  * f -> ...)))` over arrays of structs — runs per candidate pair through
  * Catalyst's INTERPRETED higher-order-function path (HOF lambdas don't
  * codegen): at sf0.1 the d14 verify over ~194k candidates measured 7.8 s
  * of the operator's 8.6. This kernel is the same integer loop inside
  * whole-stage codegen: no lambda dispatch, no boxing, no per-element
  * struct access. Spec-pinned bit-identical to the declarative
  * formulation (AlignSeqScoreSpec + the DedupSpec brute-force gate).
  */
case class AlignSeqScore(
    left: Expression,
    right: Expression,
    wordsPerFrame: Int,
    maxOffset: Int,
    maxHamming: Int)
    extends BinaryExpression {

  require(wordsPerFrame > 0 && maxOffset >= 0 && maxHamming >= 0,
    "graft_align_score requires wordsPerFrame > 0, maxOffset >= 0, maxHamming >= 0")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_align_score requires two array<bigint> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_align_score"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val out = AlignSeqScore.score(
      x, y, wordsPerFrame, maxOffset, maxHamming)
    new GenericArrayData(Array[Any](out._1, out._2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val wpf = wordsPerFrame
      val nA = ctx.freshName("nA")
      val nB = ctx.freshName("nB")
      val best = ctx.freshName("best")
      val bestO = ctx.freshName("bestO")
      val o = ctx.freshName("o")
      val f = ctx.freshName("f")
      val g = ctx.freshName("g")
      val j = ctx.freshName("j")
      val ham = ctx.freshName("ham")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $nA = $a.numElements() / $wpf;
         |int $nB = $b.numElements() / $wpf;
         |int $best = 0; int $bestO = -$maxOffset;
         |for (int $o = -$maxOffset; $o <= $maxOffset; $o++) {
         |  int $cnt = 0;
         |  for (int $f = 0; $f < $nA; $f++) {
         |    int $g = $f + $o;
         |    if ($g >= 0 && $g < $nB) {
         |      int $ham = 0;
         |      for (int $j = 0; $j < $wpf; $j++) {
         |        $ham += java.lang.Long.bitCount(
         |          $a.getLong($f * $wpf + $j) ^ $b.getLong($g * $wpf + $j));
         |      }
         |      if ($ham <= $maxHamming) { $cnt++; }
         |    }
         |  }
         |  if ($cnt > $best) { $best = $cnt; $bestO = $o; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new Object[]{ $bestO, $best });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AlignSeqScore {
  /** Shared scoring loop (the eval path; codegen emits the same loop).
    * Returns (best_offset, matched) with ties resolved to the SMALLEST
    * offset — `cnt > best` with ascending o, and best initialized to 0 at
    * −maxOffset, so an all-miss pair reports (−maxOffset, 0).
    */
  def score(
      a: ArrayData, b: ArrayData,
      wordsPerFrame: Int, maxOffset: Int, maxHamming: Int): (Int, Int) = {
    val nA = a.numElements() / wordsPerFrame
    val nB = b.numElements() / wordsPerFrame
    var best = 0
    var bestO = -maxOffset
    var o = -maxOffset
    while (o <= maxOffset) {
      var cnt = 0
      var f = 0
      while (f < nA) {
        val g = f + o
        if (g >= 0 && g < nB) {
          var ham = 0
          var j = 0
          while (j < wordsPerFrame) {
            ham += java.lang.Long.bitCount(
              a.getLong(f * wordsPerFrame + j) ^ b.getLong(g * wordsPerFrame + j))
            j += 1
          }
          if (ham <= maxHamming) cnt += 1
        }
        f += 1
      }
      if (cnt > best) { best = cnt; bestO = o }
      o += 1
    }
    (bestO, best)
  }
}
