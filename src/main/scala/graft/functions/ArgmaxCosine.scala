package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native Catalyst expression: nearest centroid of one array<double> vector
  * over a driver-baked centroid matrix, by cosine, in a single codegen'd
  * pass — `struct(cid, cos)` out.
  *
  * This replaces the IVF assignment's row explosion: the declarative
  * formulation (corpus crossJoin broadcast-centroids → per-row cosine →
  * `max_by` re-aggregation by id) materializes n·nCentroids joined rows
  * EACH carrying both 64-double arrays — ~2.6 GB of UnsafeRow copying for
  * 20k vectors × 128 cells at sf0.1, then a full hash re-aggregation on
  * id. Here the same flops run as a tight primitive loop inside
  * whole-stage codegen, map-only: one output row per input row, no join,
  * no re-aggregation, no shuffle. The centroid matrix rides the serialized
  * plan as a reference object (one copy per executor, exactly like a
  * broadcast) and is BOUNDED by construction — nCentroids·dim doubles, the
  * same driver state [[graft.operators.Similarity]] already materializes
  * for Lloyd training.
  *
  * Value-faithful to the join formulation bit for bit (spec-pinned):
  *  - dot products accumulate ascending-index, the [[DotProduct]] order;
  *  - `cos = dot / (nv * nq)` with `nv = sqrt(dot(v, v))` over the FULL
  *    input vector and `nq` precomputed per centroid with the same ops;
  *  - the argmax replicates `max_by(struct(cid, cos), struct(cos, cid))`
  *    under Spark's nan-safe double order (NaN greatest, -0.0 == 0.0,
  *    ties on cos → larger cid wins).
  *
  * Vectors longer than `dim` contribute only their first `dim` elements to
  * the pair dot (zip semantics, as graft_dot); elements are assumed
  * non-null (embedding vectors by construction).
  */
case class ArgmaxCosine(
    child: Expression,
    cids: Array[Long],
    matrix: Array[Double],
    dim: Int)
    extends UnaryExpression {

  require(cids.nonEmpty, "graft argmax-cosine needs at least one centroid")
  require(matrix.length == cids.length * dim,
    s"centroid matrix must be nCentroids*dim = ${cids.length * dim} doubles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"argmax-cosine requires an array<double> argument, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def prettyName: String = "graft_argmax_cos"

  /** Per-centroid norms, precomputed once with the exact ascending
    * accumulation + sqrt the join formulation's `sqrt(graft_dot(qv, qv))`
    * performs — deterministic IEEE ops, identical on driver and executor.
    */
  @transient private lazy val norms: Array[Double] = {
    val out = new Array[Double](cids.length)
    var c = 0
    while (c < cids.length) {
      var s = 0.0
      val off = c * dim
      var i = 0
      while (i < dim) { s += matrix(off + i) * matrix(off + i); i += 1 }
      out(c) = math.sqrt(s)
      c += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val vn = v.numElements()
    var dvv = 0.0
    var i = 0
    while (i < vn) { dvv += v.getDouble(i) * v.getDouble(i); i += 1 }
    val nv = math.sqrt(dvv)
    val pn = math.min(vn, dim)
    var bestCid = 0L
    var bestCos = 0.0
    var c = 0
    while (c < cids.length) {
      var dot = 0.0
      val off = c * dim
      var d = 0
      while (d < pn) { dot += v.getDouble(d) * matrix(off + d); d += 1 }
      val cos = dot / (nv * norms(c))
      val cid = cids(c)
      val better =
        if (c == 0) true
        else if (java.lang.Double.isNaN(cos) && java.lang.Double.isNaN(bestCos))
          cid > bestCid
        else if (cos == bestCos) cid > bestCid
        else if (java.lang.Double.isNaN(cos)) true
        else if (java.lang.Double.isNaN(bestCos)) false
        else cos > bestCos
      if (better) { bestCos = cos; bestCid = cid }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestCos))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val matRef = ctx.addReferenceObj("matrix", matrix, "double[]")
      val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
      val vn = ctx.freshName("vn")
      val dvv = ctx.freshName("dvv")
      val nv = ctx.freshName("nv")
      val pn = ctx.freshName("pn")
      val bc = ctx.freshName("bestCid")
      val bcos = ctx.freshName("bestCos")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val cos = ctx.freshName("cos")
      val cid = ctx.freshName("cid")
      val better = ctx.freshName("better")
      val i = ctx.freshName("i")
      s"""
         |int $vn = $a.numElements();
         |double $dvv = 0.0;
         |for (int $i = 0; $i < $vn; $i++) { $dvv += $a.getDouble($i) * $a.getDouble($i); }
         |double $nv = java.lang.Math.sqrt($dvv);
         |int $pn = java.lang.Math.min($vn, $dim);
         |long $bc = 0L;
         |double $bcos = 0.0;
         |for (int $c = 0; $c < ${cids.length}; $c++) {
         |  double $dot = 0.0;
         |  int $off = $c * $dim;
         |  for (int $d = 0; $d < $pn; $d++) { $dot += $a.getDouble($d) * $matRef[$off + $d]; }
         |  double $cos = $dot / ($nv * $normsRef[$c]);
         |  long $cid = $cidsRef[$c];
         |  boolean $better;
         |  if ($c == 0) { $better = true; }
         |  else if (java.lang.Double.isNaN($cos) && java.lang.Double.isNaN($bcos)) { $better = $cid > $bc; }
         |  else if ($cos == $bcos) { $better = $cid > $bc; }
         |  else if (java.lang.Double.isNaN($cos)) { $better = true; }
         |  else if (java.lang.Double.isNaN($bcos)) { $better = false; }
         |  else { $better = $cos > $bcos; }
         |  if ($better) { $bcos = $cos; $bc = $cid; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $bc, $bcos });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
