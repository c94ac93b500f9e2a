package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native bounded top-k aggregate: keeps the k largest (score, id)
  * pairs — score desc, id asc on ties — in a fixed-size buffer. The
  * grouped-top-k primitive as an AGGREGATE instead of a window:
  * `row_number().over(partitionBy(g).orderBy(score))` sorts EVERY row
  * of every group and shuffles them all; this aggregate keeps ≤ k
  * pairs per partial, merges by re-selection (exact top-k is a
  * commutative/associative selection over multiset union, so the
  * result is merge-order-independent — unlike [[SpaceSavingAgg]], no
  * bound contract is needed, plain equality gates it), and shuffles
  * exactly k pairs per group. At 100 TB with millions of groups the
  * window plan moves the whole fact table through a sort; this moves
  * k rows per group through a hash aggregate.
  *
  * Determinism: ids are assumed unique within a group (enforce with
  * any unique column); the (score desc, id asc) total order makes the
  * boundary pick exact on ties. Output: flattened `[score, id]*` in
  * rank order.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  require(k > 0, "top-k aggregate needs a positive k")

  override def prettyName: String = "top_k_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)

  // "worst first" order so the eviction candidate is the head:
  // ascending score, DESCENDING id (an id-tie's loser is the larger id)
  private val ord: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), (Long, Long)] { case (s, i) => (s, -i) }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def insert(buf: java.util.TreeSet[(Long, Long)], s: Long, i: Long): Unit = {
    if (buf.size < k) buf.add((s, i))
    else if (ord.compare((s, i), buf.first()) > 0) {
      buf.pollFirst(); buf.add((s, i))
    }
  }

  override def update(
      buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[(Long, Long)],
      b2: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    b2.forEach(p => insert(b1, p._1, p._2))
    b1
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val flat = new Array[Long](buf.size * 2)
    var idx = buf.size * 2
    // TreeSet iterates worst→best; fill backwards for rank order
    buf.forEach { p =>
      idx -= 2; flat(idx) = p._1; flat(idx + 1) = p._2
    }
    new GenericArrayData(flat)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach { p => bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong(), bb.getLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** `top_k_agg(score, id, k)` as a Column aggregate returning the
    * flattened `[score, id]*` ARRAY<BIGINT> in rank order.
    */
  def topKAgg(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      TopKAgg(GraftSqlBridge.toExpression(score),
        GraftSqlBridge.toExpression(id), k).toAggregateExpression())
}
