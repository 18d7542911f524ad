package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) state: the k lexicographically smallest DISTINCT
  * strings seen so far, in a bounded sorted set. Bottom-k of a union is the
  * bottom-k of the union of bottom-ks, so this state is MERGEABLE in any
  * tree shape — the same "Mergeable Summaries" contract as [[MGSummary]] —
  * and a merge tree lands on EXACTLY the single-pass result (no
  * approximation in the merge itself; only the final NDV estimator is
  * approximate).
  */
final class KmvSet(val k: Int) {
  val set = new java.util.TreeSet[String]()

  def insert(s: String): Unit = {
    // only admit a candidate that can enter the bottom-k: below the current
    // worst, or the set is not full — keeps every insert O(log k)
    if (set.size < k) { set.add(s); () }
    else if (s.compareTo(set.last) < 0) {
      if (set.add(s)) { set.pollLast(); () }
    }
  }

  def mergeFrom(other: KmvSet): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
  }

  /** Ascending (smallest-first) — the canonical KMV representation. */
  def sorted: Array[String] = set.toArray(new Array[String](set.size))
}

/** `graft_kmv(s, k)` — the k smallest distinct strings of a column as a real
  * AGGREGATE: per-partition bounded sets (map-side combine), O(k) partial
  * buffers on the wire, associative merges. This replaces the
  * `distinct → global sort → limit k` formulation of the A18/A25/A26 KMV
  * sketch, whose distinct is a FULL shuffle of every unique hash in the
  * column — here nothing ever shuffles but ≤k strings per partition, and C
  * columns of one table can be sketched in ONE scan (C aggregates in one
  * `agg`) instead of C distinct-sort-limit passes. Nulls are skipped (a
  * null hashes to nothing). Returns `array<string>` ascending — identical
  * bytes to `sort_array(collect_list(h))` over the old bottom-k selection,
  * so existing oracles hold unchanged.
  */
case class KmvStrings(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSet] {

  require(k > 1 && k <= 100000, "graft_kmv requires 2 <= k <= 100000")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv requires a string input, got ${t.sql}")
    }

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): KmvSet = new KmvSet(k)

  override def update(buffer: KmvSet, input: InternalRow): KmvSet = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.toString)
    buffer
  }

  override def merge(buffer: KmvSet, other: KmvSet): KmvSet = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: KmvSet): Any = {
    val entries = buffer.sorted
    val out = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      out(i) = UTF8String.fromString(entries(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: KmvSet): Array[Byte] = {
    val entries = buffer.sorted
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(entries.length)
    entries.foreach { s =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSet = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new KmvSet(k)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.set.add(new String(b, StandardCharsets.UTF_8))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvStrings =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvStrings =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvStrings =
    copy(child = newChildren.head)
}
