package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_list` with a hard buffer cap, for df-capped inverted
  * indexes: collects at most `cap + 1` longs per group and then stops
  * appending. Groups that overflow come out with `cap + 1` elements —
  * one past the cap — so a `size(...) <= cap` filter drops them
  * without ever having built their full posting list. A plain
  * collect-then-filter materializes the COMPLETE posting list of every
  * hot stop-shingle inside a single aggregation buffer, which is the
  * classic inverted-index OOM at corpus scale; this aggregate bounds
  * every buffer (partial and final — map-side combine caps too) at
  * `cap + 1` longs by construction, while keeping the single-shuffle
  * plan shape of `collect_list`.
  *
  * Output is SORTED ascending. Retained elements under overflow depend
  * on merge order, but overflowed groups are exactly the ones the df
  * cap discards, so kept groups (which retained everything) are
  * deterministic.
  */
case class CappedSortedList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.ArrayList[Long]]
    with UnaryLike[Expression] {

  private val limit = cap + 1

  override def createAggregationBuffer(): java.util.ArrayList[Long] =
    new java.util.ArrayList[Long]()

  override def update(buf: java.util.ArrayList[Long],
      input: InternalRow): java.util.ArrayList[Long] = {
    if (buf.size() < limit) {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: java.util.ArrayList[Long],
      b2: java.util.ArrayList[Long]): java.util.ArrayList[Long] = {
    var i = 0
    val n = b2.size()
    while (b1.size() < limit && i < n) {
      b1.add(b2.get(i))
      i += 1
    }
    b1
  }

  override def eval(buf: java.util.ArrayList[Long]): Any = {
    val out = new Array[Long](buf.size())
    var i = 0
    while (i < out.length) { out(i) = buf.get(i); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.ArrayList[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    var i = 0
    while (i < buf.size()) { bb.putLong(buf.get(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.ArrayList[Long](n)
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "capped_sorted_list"
  override def withNewMutableAggBufferOffset(o: Int): CappedSortedList =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedSortedList =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CappedSortedList {
  def apply(c: Column, cap: Int): Column =
    GraftColumnBridge.column(
      CappedSortedList(GraftColumnBridge.expression(c), cap)
        .toAggregateExpression())
}
