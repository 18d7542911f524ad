package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: all `m` PQ subspace code assignments of one
  * (already L2-normalized) array<double> vector in a single codegen'd
  * pass — `array<long>` out, element s = the nearest code of subspace s.
  *
  * The sibling of [[ArgmaxCosine]] for the product-quantization encode:
  * the declarative formulation (explode into m subvectors → broadcast join
  * the (sub, cid, cv) codebook → per-row squared-L2 → `min_by` re-agg by
  * (id, sub)) materializes n·m·nCodes joined rows each carrying two
  * subvector arrays — ~1.3M rows at sf0.1 — where this loop emits one
  * m-length array per input row, map-only, no join, no re-aggregation.
  * The codebook rides the serialized plan as reference objects, bounded by
  * construction (m·nCodes·subDim doubles — the persisted-index artifact).
  *
  * Value-faithful to the join formulation (spec-pinned):
  *  - d² per code is the ascending `aggregate(zip_with(sv, cv,
  *    (x,y)->(x-y)*(x-y)))` fold, truncated to the shorter array;
  *  - the winner replicates `min_by(cid, struct(d2, cid))` under Spark's
  *    nan-safe double order (NaN greatest — never the min; ties on d² →
  *    SMALLER cid wins).
  *
  * Layout: codes of subspace s occupy `[offsets(s), offsets(s+1))` in
  * `cids`/`matrix` (matrix entry j = subDim doubles at j·subDim).
  */
case class PqNearestCodes(
    child: Expression,
    offsets: Array[Int],
    cids: Array[Long],
    matrix: Array[Double],
    m: Int,
    subDim: Int)
    extends UnaryExpression {

  require(offsets.length == m + 1 && offsets.head == 0 &&
    offsets.last == cids.length, "offsets must index cids per subspace")
  require((0 until m).forall(s => offsets(s + 1) > offsets(s)),
    "every subspace needs at least one code")
  require(matrix.length == cids.length * subDim,
    "matrix must carry subDim doubles per code")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq-nearest-codes requires an array<double> argument, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val vn = v.numElements()
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      val pn = math.max(0, math.min(subDim, vn - base))
      var bestCid = 0L
      var bestD2 = 0.0
      var first = true
      var j = offsets(s)
      while (j < offsets(s + 1)) {
        var d2 = 0.0
        val off = j * subDim
        var i = 0
        while (i < pn) {
          val diff = v.getDouble(base + i) - matrix(off + i)
          d2 += diff * diff
          i += 1
        }
        val cid = cids(j)
        val better =
          if (first) true
          else if (java.lang.Double.isNaN(d2) && java.lang.Double.isNaN(bestD2))
            cid < bestCid
          else if (d2 == bestD2) cid < bestCid
          else if (java.lang.Double.isNaN(d2)) false
          else if (java.lang.Double.isNaN(bestD2)) true
          else d2 < bestD2
        if (better) { bestD2 = d2; bestCid = cid; first = false }
        j += 1
      }
      out(s) = bestCid
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val offRef = ctx.addReferenceObj("offsets", offsets, "int[]")
      val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val matRef = ctx.addReferenceObj("matrix", matrix, "double[]")
      val vn = ctx.freshName("vn")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val pn = ctx.freshName("pn")
      val bc = ctx.freshName("bestCid")
      val bd = ctx.freshName("bestD2")
      val first = ctx.freshName("first")
      val j = ctx.freshName("j")
      val d2 = ctx.freshName("d2")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      val cid = ctx.freshName("cid")
      val better = ctx.freshName("better")
      s"""
         |int $vn = $a.numElements();
         |long[] $out = new long[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $subDim;
         |  int $pn = java.lang.Math.max(0, java.lang.Math.min($subDim, $vn - $base));
         |  long $bc = 0L;
         |  double $bd = 0.0;
         |  boolean $first = true;
         |  for (int $j = $offRef[$s]; $j < $offRef[$s + 1]; $j++) {
         |    double $d2 = 0.0;
         |    int $off = $j * $subDim;
         |    for (int $i = 0; $i < $pn; $i++) {
         |      double $diff = $a.getDouble($base + $i) - $matRef[$off + $i];
         |      $d2 += $diff * $diff;
         |    }
         |    long $cid = $cidsRef[$j];
         |    boolean $better;
         |    if ($first) { $better = true; }
         |    else if (java.lang.Double.isNaN($d2) && java.lang.Double.isNaN($bd)) { $better = $cid < $bc; }
         |    else if ($d2 == $bd) { $better = $cid < $bc; }
         |    else if (java.lang.Double.isNaN($d2)) { $better = false; }
         |    else if (java.lang.Double.isNaN($bd)) { $better = true; }
         |    else { $better = $d2 < $bd; }
         |    if ($better) { $bd = $d2; $bc = $cid; $first = false; }
         |  }
         |  $out[$s] = $bc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
