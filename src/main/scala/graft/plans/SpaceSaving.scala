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
case class SpaceSavingAgg(child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType()
      .add("item", StringType, nullable = false)
      .add("est_count", LongType, nullable = false),
    containsNull = false)
  override def prettyName: String = "approx_top_k"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some(c) => buf(item) = c + 1
        case None if buf.size < capacity => buf(item) = 1L
        case None =>
          // evict a minimum-count entry (deterministic tie-break: the
          // lexicographically greatest among minima) and inherit its
          // count — the classic SpaceSaving overestimate
          var minC = Long.MaxValue
          var minK: String = null
          buf.foreach { case (key, c) =>
            if (c < minC || (c == minC && (minK == null || key > minK))) { minC = c; minK = key }
          }
          buf.remove(minK)
          buf(item) = minC + 1
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) => buf(key) = buf.getOrElse(key, 0L) + c }
    if (buf.size > capacity) {
      // keep the top `capacity` by (count desc, item asc) — the
      // mergeable-summaries prune
      val keep = buf.toSeq.sortBy { case (key, c) => (-c, key) }.take(capacity)
      buf.clear()
      keep.foreach { case (key, c) => buf(key) = c }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)
    new GenericArrayData(top.map { case (key, c) =>
      InternalRow(UTF8String.fromString(key), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
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
