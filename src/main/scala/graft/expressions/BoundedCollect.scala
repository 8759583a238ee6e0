package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Growable long buffer with a hard cap: appends past `limit` flip the
  * buffer to OVERFLOWED and stop storing — memory stays O(limit) per
  * aggregation key no matter how skewed the key is. Once overflowed, a
  * buffer never un-overflows (merges propagate the flag).
  */
final class BoundedLongs(val limit: Int) {
  var arr: Array[Long] = new Array[Long](math.min(limit, 16).max(1))
  var n: Int = 0
  var overflowed: Boolean = false

  def add(v: Long): Unit =
    if (!overflowed) {
      if (n >= limit) { overflowed = true; arr = null }
      else {
        if (n == arr.length)
          arr = java.util.Arrays.copyOf(arr,
            math.min(limit.toLong, arr.length * 2L).toInt)
        arr(n) = v
        n += 1
      }
    }
}

/** Aggregate: collect up to `limit` long values per group; a group
  * that exceeds the cap yields an EMPTY array instead of an executor
  * OOM — the df-cap primitive behind [[graft.operators.Dedup
  * .ngramJaccard]]'s posting lists (SURVEY.md §2 E4). The point is the
  * memory contract, which `collect_list` + `filter(size(..) <= cap)`
  * cannot give: the built-in collector materializes the WHOLE group
  * before the filter sees its size, so one stopword-grade shingle at
  * corpus scale (df 10^8) allocates gigabytes mid-aggregation. This
  * buffer stops storing at `limit` and remembers only the overflow
  * bit — O(limit) heap per key, exact results for every key at or
  * under the cap, and a deterministic empty (not a sample, whose
  * contents would depend on shuffle arrival order) for keys above it.
  *
  * Order contract: callers must not depend on element order (shuffle
  * fetch order is nondeterministic). The pair-emission kernels
  * downstream are order-insensitive: each unordered pair is emitted
  * once whatever the posting order.
  */
case class BoundedCollectLong(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedLongs] with UnaryLike[Expression] {

  require(limit > 0, s"limit must be > 0: $limit")

  override def createAggregationBuffer(): BoundedLongs =
    new BoundedLongs(limit)

  override def update(b: BoundedLongs, input: InternalRow): BoundedLongs = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BoundedLongs, o: BoundedLongs): BoundedLongs = {
    if (o.overflowed) { b.overflowed = true; b.arr = null }
    else {
      var i = 0
      while (i < o.n && !b.overflowed) { b.add(o.arr(i)); i += 1 }
    }
    b
  }

  override def eval(b: BoundedLongs): Any =
    if (b.overflowed) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(java.util.Arrays.copyOf(b.arr, b.n))

  override def serialize(b: BoundedLongs): Array[Byte] = {
    if (b.overflowed) Array[Byte](1)
    else {
      val bb = ByteBuffer.allocate(1 + 4 + 8 * b.n)
      bb.put(0: Byte).putInt(b.n)
      var i = 0
      while (i < b.n) { bb.putLong(b.arr(i)); i += 1 }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): BoundedLongs = {
    val b = new BoundedLongs(limit)
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == (1: Byte)) { b.overflowed = true; b.arr = null }
    else {
      val n = bb.getInt
      b.arr = new Array[Long](math.max(n, 1))
      var i = 0
      while (i < n) { b.arr(i) = bb.getLong; i += 1 }
      b.n = n
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression)
      : BoundedCollectLong = copy(child = c)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_collect_long"
}

object BoundedCollect {
  /** Column form of [[BoundedCollectLong]]. */
  def boundedCollectLong(c: Column, limit: Int): Column =
    Bridge.column(BoundedCollectLong(Bridge.toExpression(c), limit)
      .toAggregateExpression())
}
