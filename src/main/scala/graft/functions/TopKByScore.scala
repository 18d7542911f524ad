package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded state of one [[TopKByScore]] aggregation group: at most k
  * (score, id) entries, held in a min-heap whose HEAD is the current WORST
  * entry (lowest score; ties prefer keeping the smaller id, so the worst of
  * equals is the larger id). A candidate enters only by beating the head —
  * every partial buffer is O(k) in memory and on the wire, never O(rows).
  */
final class TopKHeap(val k: Int) {
  // worst-first ordering: smaller score first; equal scores put the LARGER
  // id first (it is the one that loses to an equal-score smaller id)
  private val heap = new java.util.PriorityQueue[TopKHeap.Entry](
    math.max(k, 1),
    (a: TopKHeap.Entry, b: TopKHeap.Entry) => {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    })

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.offer(new TopKHeap.Entry(score, id))
    else {
      val w = heap.peek()
      // better than the worst: higher score, or equal score with smaller id
      if (score > w.score || (score == w.score && id < w.id)) {
        heap.poll()
        heap.offer(new TopKHeap.Entry(score, id))
      }
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); insert(e.score, e.id) }
  }

  /** Entries best-first: score descending, ties broken on ascending id. */
  def sortedEntries: Array[TopKHeap.Entry] = {
    val arr = heap.toArray(new Array[TopKHeap.Entry](heap.size))
    java.util.Arrays.sort(arr, (a: TopKHeap.Entry, b: TopKHeap.Entry) => {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    })
    arr
  }

  def size: Int = heap.size
}

object TopKHeap {
  final class Entry(val score: Double, val id: Long)
}

/** `graft_topk(score, id, k)` — per-group top-k selection as a real
  * AGGREGATE (partial per-partition heaps + O(k) merges) instead of a
  * `row_number()` window: the window formulation shuffles EVERY scored row
  * into its group's single partition and sorts the whole group in one task —
  * the plan-level scale-killer for brute-force similarity ranking, where one
  * group is (query × entire corpus). Here each partition keeps a k-bounded
  * heap (map-side combine), the shuffle carries one ≤k buffer per
  * (partition, group), and no global per-group sort ever exists.
  *
  * Returns `array<struct<id, score>>` sorted best-first (score descending,
  * id ascending on ties) — a deterministic total order, so results are
  * engine-reproducible and value-oracle-gated. Null scores/ids are skipped
  * (a null cosine cannot rank).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "graft_topk requires k > 0")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, bigint), got ${s.sql} and ${i.sql}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val entries = buffer.sortedEntries
    val rows = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      rows(i) = InternalRow(entries(i).id, entries(i).score)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val entries = buffer.sortedEntries
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { e => bb.putLong(e.id); bb.putDouble(e.score) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { val id = bb.getLong; val s = bb.getDouble; h.insert(s, id); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
