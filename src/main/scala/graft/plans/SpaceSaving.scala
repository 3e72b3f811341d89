package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** approx_top_k(item, k, capacity): heavy hitters via the SpaceSaving
  * summary (Metwally et al., "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams") as a `TypedImperativeAggregate`.
  *
  * This is the bounded-memory shape of `text_vocab` for 100 TB: the
  * exact explode→count→top-k moves one row per DISTINCT token through
  * the shuffle — fine for word vocabularies, fatal for high-cardinality
  * domains (URLs, n-grams, user ids). SpaceSaving keeps at most
  * `capacity` counters per partial buffer no matter how many distinct
  * items flow through; partials merge associatively (sum counts on the
  * union, keep the top `capacity` — Agarwal et al., "Mergeable
  * Summaries"), so map-side combine works and the shuffle moves one
  * O(capacity) summary per group.
  *
  * Guarantees (asserted in SketchMergeSpec): estimated counts
  * overestimate true counts by at most εN with ε = 1/capacity over a
  * partial, and any item with true frequency > N/capacity survives.
  * Tie-breaks (eviction and final ordering) are deterministic, but like
  * any sketch the estimates can vary with partition layout — the
  * registered query is rows-only.
  */
/** Aggregation state: the counter map plus a LAZY-DELETION min-heap over
  * (count, key) that makes eviction O(log capacity) amortized instead of
  * an O(capacity) full-map scan per evicting row — the hot path on
  * high-cardinality streams, where most inputs are new items against a
  * full buffer. Heap entries go stale when a key's count moves; pops
  * validate against the map and discard stale entries. The heap is
  * DERIVED state: never serialized, rebuilt on demand after
  * deserialize/merge. Ordering pops (min count, then GREATEST key) —
  * the same deterministic tie-break the scan used. */
final class SSBuffer {
  val map: mutable.HashMap[String, Long] = mutable.HashMap.empty
  private var heap: mutable.PriorityQueue[(Long, String)] = _

  // PriorityQueue dequeues the MAX: order so the max is (min count,
  // greatest key among that count)
  private val popOrder: Ordering[(Long, String)] = new Ordering[(Long, String)] {
    def compare(a: (Long, String), b: (Long, String)): Int = {
      val c = java.lang.Long.compare(b._1, a._1) // smaller count = larger
      if (c != 0) c else a._2.compareTo(b._2) // greater key = larger
    }
  }

  def push(key: String, count: Long): Unit = {
    if (heap != null) {
      heap.enqueue((count, key))
      // stale entries accumulate one per update — rebuild once they
      // dominate, keeping amortized O(log capacity) per update
      if (heap.size > 8 * map.size + 64) rebuild()
    }
  }

  def invalidate(): Unit = heap = null

  private def rebuild(): Unit = {
    heap = mutable.PriorityQueue.empty(popOrder)
    map.foreach { case (key, c) => heap.enqueue((c, key)) }
  }

  /** Remove and return the (minimum-count, greatest-key) entry. */
  def popMin(): (String, Long) = {
    if (heap == null) rebuild()
    while (true) {
      val (c, key) = heap.dequeue()
      if (map.get(key).contains(c)) { map.remove(key); return (key, c) }
    }
    throw new IllegalStateException("unreachable")
  }
}

case class SpaceSavingAgg(child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SSBuffer] {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType()
      .add("item", StringType, nullable = false)
      .add("est_count", LongType, nullable = false),
    containsNull = false)
  override def prettyName: String = "approx_top_k"

  override def createAggregationBuffer(): SSBuffer = new SSBuffer

  override def update(buf: SSBuffer, input: InternalRow): SSBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.map.get(item) match {
        case Some(c) =>
          buf.map(item) = c + 1
          buf.push(item, c + 1)
        case None if buf.map.size < capacity =>
          buf.map(item) = 1L
          buf.push(item, 1L)
        case None =>
          // evict the minimum-count entry (deterministic tie-break: the
          // lexicographically greatest among minima) and inherit its
          // count — the classic SpaceSaving overestimate. O(log capacity)
          // amortized via the lazy-deletion heap.
          val (_, minC) = buf.popMin()
          buf.map(item) = minC + 1
          buf.push(item, minC + 1)
      }
    }
    buf
  }

  override def merge(buf: SSBuffer, other: SSBuffer): SSBuffer = {
    other.map.foreach { case (key, c) => buf.map(key) = buf.map.getOrElse(key, 0L) + c }
    if (buf.map.size > capacity) {
      // keep the top `capacity` by (count desc, item asc) — the
      // mergeable-summaries prune
      val keep = buf.map.toSeq.sortBy { case (key, c) => (-c, key) }.take(capacity)
      buf.map.clear()
      keep.foreach { case (key, c) => buf.map(key) = c }
    }
    buf.invalidate() // counts moved wholesale — heap rebuilt on demand
    buf
  }

  override def eval(buf: SSBuffer): Any = {
    val top = buf.map.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)
    new GenericArrayData(top.map { case (key, c) =>
      InternalRow(UTF8String.fromString(key), c)
    }.toArray[Any])
  }

  override def serialize(buf: SSBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.map.size)
    buf.map.foreach { case (key, c) =>
      val b = key.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SSBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SSBuffer
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.map(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SpaceSaving {
  /** Column entry point: `approxTopK(items, k)` inside `agg(...)`.
    * `capacity` trades memory for accuracy (ε = 1/capacity). */
  def approxTopK(item: Column, k: Int, capacity: Int = 256): Column =
    ColumnBridge.column(
      SpaceSavingAgg(ColumnBridge.expression(item), k, capacity).toAggregateExpression())
}
