package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash aggregate: folds a stream of 64-bit token hashes into
  * one `numBits`-bit SimHash fingerprint per group.
  *
  * Replaces the "one SUM(CASE…) aggregate per bit" formulation (48
  * aggregate slots, each re-evaluating a shift/mask expression per row)
  * with a single [[TypedImperativeAggregate]] whose update is one tight
  * JVM loop over an int[] vote buffer — same partial-aggregation
  * contract as any built-in (map-side combine, then buffer merge at the
  * exchange), so the shuffle carries `numBits` ints per group per
  * partition instead of 48 separate agg states.
  *
  * Semantics (bit j set iff strictly more 1-votes than 0-votes) are
  * identical to the SUM(CASE) formulation and to the DuckDB oracle in
  * [[graft.operators.Dedup]] for non-null inputs. NULL hashes are
  * IGNORED (a no-op vote), the standard Spark aggregate contract —
  * whereas the SUM(CASE) spelling would count a null as a -1 vote on
  * every bit (its ELSE branch). The tokenize→hash pipeline never
  * produces null hashes, and the equivalence spec pins the skip
  * behavior explicitly.
  */
case class SimHashAgg(
    child: Expression,
    numBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def prettyName: String = "simhash_agg"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](numBits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < numBits) {
        if (((h >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < numBits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var sim = 0L
    var j = 0
    while (j < numBits) {
      if (buf(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * buf.length)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** `simhash_agg(hashCol)` as a Column aggregate. */
  def simhashAgg(c: Column, numBits: Int): Column =
    GraftSqlBridge.toColumn(
      SimHashAgg(GraftSqlBridge.toExpression(c), numBits).toAggregateExpression())
}
