package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature aggregate: folds a stream of base token
  * hashes into the `perms.length`-wide signature
  * `sig[i] = min over tokens of (h*a_i + b_i) mod p` in ONE aggregate
  * buffer (a long[] updated in a tight loop), instead of one
  * MIN(pmod(...)) aggregate slot per permutation. Identical partial
  * aggregation/merge contract as built-in MIN; bit-identical results to
  * the per-slot formulation and to the DuckDB oracle in
  * [[graft.operators.Dedup]].
  *
  * @param perms (a, b) affine permutation coefficients
  * @param mod   the common modulus p
  */
case class MinHashAgg(
    child: Expression,
    perms: Seq[(Long, Long)],
    mod: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "minhash_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null when the group had no non-null input — the same contract as
  // built-in MIN (every signature value is < mod, so the untouched
  // MaxValue sentinel is unambiguous)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  private val as: Array[Long] = perms.map(_._1).toArray
  private val bs: Array[Long] = perms.map(_._2).toArray
  private val n = perms.length

  override def createAggregationBuffer(): Array[Long] = Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        // pmod semantics (operands here are non-negative anyway)
        val m = (h * as(i) + bs(i)) % mod
        val p = if (m < 0) m + mod else m
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length > 0 && buf(0) == Long.MaxValue) null // no valid input seen
    else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** `minhash_agg(hashCol)` as a Column aggregate returning ARRAY<BIGINT>. */
  def minhashAgg(c: Column, perms: Seq[(Long, Long)], mod: Long): Column =
    GraftSqlBridge.toColumn(
      MinHashAgg(GraftSqlBridge.toExpression(c), perms, mod).toAggregateExpression())
}
