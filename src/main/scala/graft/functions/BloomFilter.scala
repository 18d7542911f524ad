package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bit-level Bloom filter kernel shared by the aggregate (build) and the
  * scalar membership probe. Double hashing (Kirsch–Mitzenmacher): two
  * SplitMix64-finalized 64-bit hashes h1, h2 generate the k probe positions
  * as h1 + i·h2 — one mix per key instead of k independent hashes, with the
  * same asymptotic false-positive rate.
  *
  * Wire format of a built filter (BinaryType): `[int32 numHashes][int32
  * numWords][numWords × int64 bit words]` — self-describing, so the probe
  * side needs no out-of-band parameters and filters built with different
  * (bits, hashes) sizings still probe correctly.
  */
object GraftBloom {

  /** SplitMix64 finalizer — a full-avalanche 64→64 mixer. */
  private def mix(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 33); z *= 0xff51afd7ed558ccdL
    z ^= (z >>> 33); z *= 0xc4ceb9fe1a85ec53L
    z ^= (z >>> 33)
    z
  }

  def setBits(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val m = words.length.toLong * 64L
    val h1 = mix(key)
    val h2 = mix(key ^ 0x9e3779b97f4a7c15L) | 1L // odd, so probes spread
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      words((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  /** Probe a serialized filter. Called from generated code — must stay a
    * cheap static method (header reads + k word probes, no allocation).
    *
    * `graft_bloom_contains` is a user-callable SQL function, so the header
    * is VALIDATED before use: an empty, truncated, or corrupted binary
    * (anything that is not `[int32 k][int32 words][words × int64]`) raises
    * a descriptive error instead of surfacing as a bare `% 0`
    * ArithmeticException or an index error from inside generated code.
    */
  def mightContain(bytes: Array[Byte], key: Long): Boolean = {
    if (bytes.length < 8)
      throw new IllegalArgumentException(
        s"graft_bloom_contains: malformed filter — ${bytes.length} bytes, " +
          "expected at least the 8-byte [numHashes][numWords] header " +
          "(is this value really a graft_bloom output?)")
    val bb = ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt(0)
    val numWords = bb.getInt(4)
    if (numHashes <= 0 || numWords <= 0 || bytes.length != 8 + numWords.toLong * 8)
      throw new IllegalArgumentException(
        s"graft_bloom_contains: malformed filter header — numHashes=$numHashes, " +
          s"numWords=$numWords for ${bytes.length} bytes; expected positive " +
          s"counts and ${if (numWords > 0) 8 + numWords.toLong * 8 else -1} bytes " +
          "(is this value really a graft_bloom output?)")
    val m = numWords.toLong * 64L
    val h1 = mix(key)
    val h2 = mix(key ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      val word = bb.getLong(8 + (pos >>> 6).toInt * 8)
      if ((word & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numHashes)
    bb.putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }

  def deserializeWords(bytes: Array[Byte]): (Array[Long], Int) = {
    val bb = ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt
    val numWords = bb.getInt
    val words = new Array[Long](numWords)
    var i = 0
    while (i < numWords) { words(i) = bb.getLong; i += 1 }
    (words, numHashes)
  }
}

/** `graft_bloom(key, numBits, numHashes)` — build a Bloom filter over a
  * bigint key column as a real mergeable AGGREGATE: each partition fills a
  * local bit array (map-side), partial filters combine by bitwise OR, and
  * the result is one `binary` value of fixed size — numBits is chosen by
  * the caller, never a function of row count. This is the distributed
  * semi-join-reduction build: at 100 TB the filter is the only thing that
  * crosses the wire from the build side before the probe, exactly the shape
  * of Spark's own runtime row-level filtering (InjectRuntimeFilter), here
  * exposed as a first-class, composable function.
  *
  * Sizing: ~10 bits/key at numHashes=7 gives ≈1% false positives; FPs cost
  * only wasted probe-side rows (the exact join downstream removes them), so
  * undersizing degrades performance, never correctness. Null keys are
  * skipped (SQL semantics: NULL IN (...) rows are never emitted by a semi
  * join anyway).
  */
case class BloomAggregate(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64, "graft_bloom requires numBits >= 64")
  require(numHashes > 0 && numHashes <= 16,
    "graft_bloom requires 1 <= numHashes <= 16")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom requires a bigint key, got ${t.sql}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((numBits + 63) / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val k = child.eval(input)
    if (k != null) GraftBloom.setBits(buffer, k.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    GraftBloom.serialize(buffer, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    GraftBloom.serialize(buffer, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    GraftBloom.deserializeWords(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains(bloom, key)` — membership probe against a built
  * filter. No false negatives; false positives at the filter's design rate.
  * Codegen'd as a static call so a bloom-pruning filter stays inside
  * whole-stage codegen on the probe side's hot path.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (binary, bigint), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(bloom: Any, key: Any): Any =
    GraftBloom.mightContain(
      bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, key) =>
      s"${ev.value} = graft.functions.GraftBloom.mightContain($bloom, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
