package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary state: at most k (item, weight)
  * counters. The classic frequent-items guarantee: after summarizing any
  * stream of n items, EVERY item with true frequency > n/k is present, and
  * each kept weight underestimates the true count by at most n/k. Both
  * operations below preserve the guarantee, so summaries are MERGEABLE in
  * any order/tree shape (Agarwal et al., "Mergeable Summaries") — exactly
  * what a partial-aggregation shuffle needs.
  */
final class MGSummary(val k: Int) {
  val counters = new java.util.HashMap[String, Long]()

  def insert(item: String, w: Long = 1L): Unit = {
    val cur = counters.get(item)
    if (cur != 0L || counters.containsKey(item)) counters.put(item, cur + w)
    else if (counters.size < k) counters.put(item, w)
    else {
      // decrement-all by the smallest weight (batch form of the classic
      // per-item decrement); drop zeros, then the item takes the remainder
      val dec = math.min(w, counters.values.stream
        .mapToLong(_.longValue).min.getAsLong)
      shiftDown(dec)
      if (w > dec) insert(item, w - dec)
    }
  }

  def mergeFrom(other: MGSummary): Unit = {
    other.counters.forEach((item, w) => {
      val cur = counters.get(item)
      if (cur != 0L || counters.containsKey(item)) counters.put(item, cur + w)
      else counters.put(item, w)
    })
    if (counters.size > k) {
      // subtract the (k+1)-th largest weight from everything, drop <= 0 —
      // the mergeable-summaries trim, error adds across merges but stays
      // <= n/k overall
      val ws = counters.values.toArray(new Array[java.lang.Long](counters.size))
      java.util.Arrays.sort(ws, java.util.Collections.reverseOrder())
      shiftDown(ws(k).longValue)
    }
  }

  private def shiftDown(dec: Long): Unit = {
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nw = e.getValue - dec
      if (nw <= 0L) it.remove() else e.setValue(nw)
    }
  }

  /** Candidates, deterministically ordered (weight desc, item asc). */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counters.size)
    var i = 0
    val it = counters.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    arr.sortBy { case (item, w) => (-w, item) }
  }
}

/** `graft_mg(item, k)` — Misra–Gries frequent-items AGGREGATE over a string
  * column: each partition keeps a k-counter summary (map-side), partials
  * merge associatively, and the result is `array<struct<item, lb>>` — at
  * most k candidate heavy hitters with lower-bound weights. Fixed-size
  * mergeable state, the frequency twin of the KMV distinct sketch (A18):
  * at 100 TB this is how you find the dominant tokens/domains/URLs without
  * shuffling a full (item, count) table — the candidate set is then
  * exact-verified with one bounded second pass (candidates are a SUPERSET
  * of every item with frequency > n/k, under any merge order).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] {

  require(k > 0 && k <= 100000, "graft_mg requires 1 <= k <= 100000")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_mg requires a string item, got ${t.sql}")
    }

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "item", org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "lb", org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.toString)
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MGSummary): Any = {
    val entries = buffer.sorted
    val rows = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      rows(i) = InternalRow(UTF8String.fromString(entries(i)._1), entries(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: MGSummary): Array[Byte] = {
    val entries = buffer.sorted
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(entries.length)
    entries.foreach { case (item, w) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(w)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new MGSummary(k)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.counters.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
