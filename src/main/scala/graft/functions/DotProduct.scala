package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two array<double> columns.
  *
  * This is the one hot-loop where built-ins genuinely bottleneck (SURVEY.md
  * §7.3 escalation ladder): `aggregate(zip_with(...))` evaluates its lambda
  * per ELEMENT through the interpreted HOF path, while this expression
  * compiles to a tight primitive `for` loop inside whole-stage codegen via
  * [[doGenCode]] — no per-element closure dispatch, no boxing.
  *
  * Accumulation order is ascending-index, identical to the left fold of
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0D, (acc, p) -> acc + p)`, so
  * results are bit-identical to the HOF formulation (pinned by spec) and
  * the DuckDB oracle comparisons are unaffected.
  *
  * Length mismatch truncates to the shorter array (zip semantics); array
  * ELEMENTS are assumed non-null (embedding vectors by construction —
  * a null element reads as 0.0 rather than poisoning the whole result).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for graft's native expressions. */
object GraftFunctions {

  val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")

  val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_dot expects exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  val hpSumsInfo = new ExpressionInfo(classOf[HyperplaneSums].getName, "graft_hp_sums")

  /** graft_hp_sums(v, bits, dim) — bits/dim must be foldable int literals
    * (they size the driver-computed sign matrix baked into the expression).
    */
  val hpSumsBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3,
      "graft_hp_sums expects (vector, bits, dim)")
    require(children(1).foldable && children(2).foldable,
      "graft_hp_sums bits/dim must be literals")
    HyperplaneSums(children.head,
      intLiteral(children(1), "graft_hp_sums bits"),
      intLiteral(children(2), "graft_hp_sums dim"))
  }

  private def intLiteral(e: Expression, what: String): Int =
    e.eval() match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$what must be a non-null integer literal, got $other")
    }

  val isectInfo = new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_isect_size")

  val isectBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_isect_size expects exactly 2 arguments")
    SortedIntersectSize(children.head, children(1))
  }

  val simHashInfo = new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64")

  val simHashBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_simhash64 expects exactly 1 argument")
    SimHash64(children.head)
  }

  val winnowInfo = new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow")

  val winnowBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_winnow expects (text, w)")
    require(children(1).foldable, "graft_winnow w must be a literal")
    WinnowFingerprints(children.head, intLiteral(children(1), "graft_winnow w"))
  }

  val tokenCountsInfo = new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts")

  val tokenCountsBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_token_counts expects exactly 1 argument")
    TokenCounts(children.head)
  }

  val ngramInfo = new ExpressionInfo(classOf[NgramHashes].getName, "graft_ngram_hashes")

  val ngramBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_ngram_hashes expects (text, n)")
    require(children(1).foldable, "graft_ngram_hashes n must be a literal")
    NgramHashes(children.head, intLiteral(children(1), "graft_ngram_hashes n"))
  }

  val wordShingleInfo = new ExpressionInfo(classOf[WordShingleHashes].getName, "graft_word_shingles")

  val wordShingleBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_word_shingles expects (text, n)")
    require(children(1).foldable, "graft_word_shingles n must be a literal")
    WordShingleHashes(children.head, intLiteral(children(1), "graft_word_shingles n"))
  }

  val minHashInfo = new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash")

  val minHashBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_minhash expects (shingles, numHashes)")
    require(children(1).foldable, "graft_minhash numHashes must be a literal")
    MinHashSignature(children.head,
      intLiteral(children(1), "graft_minhash numHashes"))
  }

  val topKInfo = new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk")

  /** graft_topk(score, id, k) — k must be a foldable int literal (it sizes
    * the bounded aggregation heap).
    */
  val topKBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3, "graft_topk expects (score, id, k)")
    require(children(2).foldable, "graft_topk k must be a literal")
    TopKByScore(children.head, children(1), intLiteral(children(2), "graft_topk k"))
  }

  val kmvInfo = new ExpressionInfo(classOf[KmvStrings].getName, "graft_kmv")

  /** graft_kmv(s, k) — k must be a foldable int literal (bounded set size). */
  val kmvBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_kmv expects (s, k)")
    require(children(1).foldable, "graft_kmv k must be a literal")
    KmvStrings(children.head, intLiteral(children(1), "graft_kmv k"))
  }

  val bloomInfo = new ExpressionInfo(classOf[BloomAggregate].getName, "graft_bloom")

  /** graft_bloom(key, numBits, numHashes) — sizing args must be foldable int
    * literals (they size the fixed aggregation bit array).
    */
  val bloomBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3, "graft_bloom expects (key, numBits, numHashes)")
    require(children(1).foldable && children(2).foldable,
      "graft_bloom numBits/numHashes must be literals")
    BloomAggregate(children.head,
      intLiteral(children(1), "graft_bloom numBits"),
      intLiteral(children(2), "graft_bloom numHashes"))
  }

  val mgInfo = new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_mg")

  /** graft_mg(item, k) — k must be a foldable int literal (summary size). */
  val mgBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_mg expects (item, k)")
    require(children(1).foldable, "graft_mg k must be a literal")
    MisraGriesAgg(children.head, intLiteral(children(1), "graft_mg k"))
  }

  val alignScoreInfo =
    new ExpressionInfo(classOf[AlignSeqScore].getName, "graft_align_score")

  /** graft_align_score(afs, bfs, wordsPerFrame, maxOffset, maxHamming) —
    * the three shape parameters must be foldable int literals (they size
    * the codegen'd loop).
    */
  val alignScoreBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 5,
      "graft_align_score expects (afs, bfs, wordsPerFrame, maxOffset, maxHamming)")
    require(children.drop(2).forall(_.foldable),
      "graft_align_score shape arguments must be literals")
    AlignSeqScore(children.head, children(1),
      intLiteral(children(2), "graft_align_score wordsPerFrame"),
      intLiteral(children(3), "graft_align_score maxOffset"),
      intLiteral(children(4), "graft_align_score maxHamming"))
  }

  val bloomContainsInfo =
    new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains")

  val bloomContainsBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_bloom_contains expects (bloom, key)")
    BloomMightContain(children.head, children(1))
  }

  /** Imperative, idempotent registration into an existing session (used by
    * the operators so any session works, not just extension-built ones).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_kmv", kmvBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_mg", mgBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_bloom", bloomBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_bloom_contains", bloomContainsBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_topk", topKBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_hp_sums", hpSumsBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_isect_size", isectBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_simhash64", simHashBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_minhash", minHashBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_winnow", winnowBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_token_counts", tokenCountsBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_ngram_hashes", ngramBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_word_shingles", wordShingleBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_align_score", alignScoreBuilder, "built-in")
  }
}

/** `spark.sql.extensions`-style injection: sessions built with
  * `.withExtensions(new GraftExtensions)` (see `Engine.session`) resolve
  * `graft_dot` natively without imperative registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"), GraftFunctions.dotInfo, GraftFunctions.dotBuilder))
    ext.injectFunction((FunctionIdentifier("graft_hp_sums"), GraftFunctions.hpSumsInfo, GraftFunctions.hpSumsBuilder))
    ext.injectFunction((FunctionIdentifier("graft_isect_size"), GraftFunctions.isectInfo, GraftFunctions.isectBuilder))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"), GraftFunctions.simHashInfo, GraftFunctions.simHashBuilder))
    ext.injectFunction((FunctionIdentifier("graft_minhash"), GraftFunctions.minHashInfo, GraftFunctions.minHashBuilder))
    ext.injectFunction((FunctionIdentifier("graft_winnow"), GraftFunctions.winnowInfo, GraftFunctions.winnowBuilder))
    ext.injectFunction((FunctionIdentifier("graft_token_counts"), GraftFunctions.tokenCountsInfo, GraftFunctions.tokenCountsBuilder))
    ext.injectFunction((FunctionIdentifier("graft_ngram_hashes"), GraftFunctions.ngramInfo, GraftFunctions.ngramBuilder))
    ext.injectFunction((FunctionIdentifier("graft_word_shingles"), GraftFunctions.wordShingleInfo, GraftFunctions.wordShingleBuilder))
    ext.injectFunction((FunctionIdentifier("graft_topk"), GraftFunctions.topKInfo, GraftFunctions.topKBuilder))
    ext.injectFunction((FunctionIdentifier("graft_kmv"), GraftFunctions.kmvInfo, GraftFunctions.kmvBuilder))
    ext.injectFunction((FunctionIdentifier("graft_mg"), GraftFunctions.mgInfo, GraftFunctions.mgBuilder))
    ext.injectFunction((FunctionIdentifier("graft_bloom"), GraftFunctions.bloomInfo, GraftFunctions.bloomBuilder))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"), GraftFunctions.bloomContainsInfo, GraftFunctions.bloomContainsBuilder))
    ext.injectFunction((FunctionIdentifier("graft_align_score"), GraftFunctions.alignScoreInfo, GraftFunctions.alignScoreBuilder))
    // the rowImages feed rewrite (round 20): `option("rowImages","true")`
    // on a readChangeFeed relation pairs delete x insert into
    // update_preimage/update_postimage at analysis time
    ext.injectResolutionRule(spark =>
      new graft.sources.GraftRowImagesRule(spark))
  }
}
