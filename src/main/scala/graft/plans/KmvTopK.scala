package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `kmv_topk(hv, k)` — the `k` smallest DISTINCT long values of `hv` per
  * group, ascending, as `array<long>`: the K-Minimum-Values synopsis
  * (Beyer et al., SIGMOD 2007) as ONE partially-aggregating native
  * aggregate.
  *
  * Before r21, [[graft.ops.Sketches.kmvSketch]] built this set with
  * `distinct()` + a bucketed pre-prune window + a final rank window —
  * three exchanges, each shuffling every distinct hash of the corpus
  * (guide §2.3: aggregate before you shuffle, not after). As an
  * aggregate the map side reduces each partition to ≤ k longs of
  * bounded state, the exchange moves ≤ groups×partitions×k longs no
  * matter the corpus size, and one merge finishes the sketch: one
  * exchange, corpus-size-independent bytes. Semantics are identical —
  * the k smallest distinct values of a set do not depend on
  * partitioning or arrival order (SketchSpec pins the equivalence
  * against the window form).
  *
  * State is a TreeSet capped at k: insert skips duplicates and values
  * not below the current k-th; merge re-inserts the other side's ≤ k
  * survivors. Null inputs are skipped; an empty group yields an empty
  * array (the window form likewise emitted no rows).
  */
case class KmvTopK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with BinaryLike[Expression] {

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty)
    require(v != null, "kmv_topk: k must be a non-null literal")
    val n = v.asInstanceOf[Number].intValue()
    require(n > 0, s"kmv_topk: k must be positive, got $n")
    n
  }

  override def prettyName: String = "kmv_topk"
  override def left: Expression = child
  override def right: Expression = kExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      // strictly below the current k-th: displaces it unless duplicate
      if (buf.add(v)) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next().longValue())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending = rank order
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KmvTopK =
    copy(child = newLeft, kExpr = newRight)
}
