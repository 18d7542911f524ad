package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, IntegerType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: whitespace-token → occurrence-count map of one
  * document in a single per-row pass.
  *
  * Token-level aggregation (tf, df, vocabularies) over the raw
  * `explode(split(text))` relation ships one row per token OCCURRENCE
  * through the shuffle and needs a distinct-expand to count documents.
  * Pre-aggregating within the row emits one (token, count) pair per
  * DISTINCT token per document — typically a large constant factor fewer
  * shuffled rows — and turns document frequency into a plain `count(1)`
  * (no two-phase distinct rewrite). Tokenization matches `split(text, ' ')`
  * with trailing empties kept; map iteration order is first occurrence
  * (irrelevant to downstream aggregation).
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_token_counts requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType =
    MapType(StringType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "graft_token_counts"

  override def nullSafeEval(a: Any): Any =
    TokenCounts.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenCounts.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCounts {

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayBasedMapData = {
    val tokens = text.toString.split(" ", -1)
    val counts = new java.util.LinkedHashMap[String, Int](tokens.length * 2)
    var i = 0
    while (i < tokens.length) {
      counts.merge(tokens(i), 1, (x, y) => x + y)
      i += 1
    }
    val n = counts.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var p = 0
    while (it.hasNext) {
      val e = it.next()
      keys(p) = UTF8String.fromString(e.getKey)
      vals(p) = e.getValue
      p += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
