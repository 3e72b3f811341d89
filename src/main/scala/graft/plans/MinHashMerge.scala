package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** minhash_merge(sig): aggregate MinHash signatures by ELEMENTWISE MIN —
  * the union semantics of MinHash (min over the union of shingle sets ==
  * elementwise min of the per-set signatures, exactly; asserted in
  * SketchMergeSpec). Gives group-level content sketches (e.g. one
  * signature per source over millions of docs) without re-shingling.
  *
  * A `TypedImperativeAggregate` with a fixed `numPerm`-long buffer
  * (SURVEY.md §7.3's deferred sketch-merge aggregate): the buffer is
  * 8·numPerm bytes regardless of group size, updates and merges are
  * partial+final (map-side combine works), and serialization is a flat
  * long array — the shuffle moves one small fixed-width sketch per
  * group, never the documents. */
case class MinHashMergeAgg(child: Expression, numPerm: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_merge"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  override def update(buffer: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      // a numPerm mismatch with the signature producer must fail loudly:
      // silently min-ing a prefix leaves MaxValue tail positions that
      // always "agree" across groups and inflate est_jaccard
      require(a.numElements() == numPerm,
        s"minhash_merge(numPerm=$numPerm) got a signature of length ${a.numElements()}")
      val n = numPerm
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val x = a.getLong(i)
          if (x < buffer(i)) buffer(i) = x
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numPerm)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numPerm)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashMerge {
  /** Column entry point: `minhashMerge(sigCol)` inside `agg(...)`. */
  def minhashMerge(sig: Column, numPerm: Int = 64): Column =
    ColumnBridge.column(
      MinHashMergeAgg(ColumnBridge.expression(sig), numPerm).toAggregateExpression())
}
