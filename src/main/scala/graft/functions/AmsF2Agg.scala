package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Second-frequency-moment (F2) sketch: the Alon–Matias–Szegedy
  * estimator in its bucketed Count-Sketch form (Thorup & Zhang 2004) —
  * F2 = Σ_v c_v² is exactly the SELF-JOIN SIZE on the sketched key, the
  * statistic a query optimizer wants before it commits to a join
  * strategy and a skew monitor wants as a one-number "how concentrated
  * is this key" signal.
  *
  * State: `groups × buckets` signed counters. Each input x adds
  * s_j(x) ∈ {−1, +1} to counter (j, h_j(x)) for every group j; the
  * group estimate is Σ_i z_ji² (cross terms cancel in expectation
  * because s is 4-wise independent), and the returned value is the
  * MEDIAN over groups. E[est_j] = F2 and Var(est_j) ≤ 2·F2²/buckets,
  * so at buckets=256 one group is within ±26.5% of F2 at 3σ and the
  * 5-group median is comfortably inside that — the relative bound the
  * q222 gate checks against the exact in-plan F2.
  *
  * Hashes are degree-3 polynomials over GF(2^61 − 1) (the
  * Carter–Wegman 4-wise family; products via Math.multiplyHigh), with
  * FIXED coefficients derived per (group, role) from a SplitMix64
  * chain — no runtime randomness, so the estimate is a pure function
  * of the input multiset. Counter updates are exact integer adds:
  * merge is elementwise vector addition, commutative and associative,
  * so partial aggregation, re-partitioning, and persisted-sketch
  * re-merging all yield bit-identical state (AmsF2Spec pins this).
  * At 100 TB the per-key count table never materializes: the state is
  * `groups·buckets` longs regardless of key cardinality.
  */
case class AmsF2Agg(
    child: Expression,
    buckets: Int,
    groups: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(buckets > 0 && (buckets & (buckets - 1)) == 0,
    "ams f2 buckets must be a power of two")
  require(groups > 0 && groups % 2 == 1,
    "ams f2 groups must be odd (median estimator)")

  override def prettyName: String = "ams_f2_agg"
  override def dataType: DataType = LongType
  // an empty group is a valid all-zero sketch: F2 = 0, never null
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  // degree-3 coefficients per (group, role): role 0 = bucket, 1 = sign
  private val coef: Array[Array[Long]] =
    Array.tabulate(groups * 2)(i => Array.tabulate(4)(k =>
      AmsF2Agg.mod61(AmsF2Agg.splitMix(0x9e3779b97f4a7c15L
        + 0x100000001b3L * i + 0xff51afd7ed558ccdL * k))))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](groups * buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = AmsF2Agg.mod61(v.asInstanceOf[Long])
      var j = 0
      while (j < groups) {
        val b = (AmsF2Agg.poly4(coef(2 * j), x) & (buckets - 1)).toInt
        val s = (AmsF2Agg.poly4(coef(2 * j + 1), x) & 1L) * 2L - 1L
        buf(j * buckets + b) += s
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val ests = Array.tabulate(groups) { j =>
      var sum = 0L
      var i = 0
      while (i < buckets) {
        val z = buf(j * buckets + i)
        sum += z * z
        i += 1
      }
      sum
    }
    java.util.Arrays.sort(ests)
    ests(groups / 2)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): AmsF2Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AmsF2Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AmsF2Agg =
    copy(child = newChildren.head)
}

object AmsF2Agg {
  /** 2^61 − 1 (Mersenne): reductions are shift-adds, and 61-bit
    * operands keep every intermediate below 2^62.
    */
  val P: Long = (1L << 61) - 1

  /** x mod P for any 64-bit pattern, treating x as unsigned. */
  def mod61(x: Long): Long = {
    val r = (x & P) + (x >>> 61)
    if (r >= P) r - P else r
  }

  /** (a · b) mod P for a, b ∈ [0, P): the 128-bit product hi·2^64 + lo
    * folds with 2^64 ≡ 8 (mod P).
    */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // a, b < 2^61 so the signed high is exact
    val lo = a * b
    mod61(mod61(hi << 3) + mod61(lo))
  }

  /** Degree-3 Carter–Wegman evaluation: 4-wise independent over GF(P). */
  def poly4(c: Array[Long], x: Long): Long = {
    var h = c(3)
    h = mod61(mulmod(h, x) + c(2))
    h = mod61(mulmod(h, x) + c(1))
    mod61(mulmod(h, x) + c(0))
  }

  /** SplitMix64 finalizer — fixed-coefficient generator, no state. */
  def splitMix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** `ams_f2_agg(keyCol)`: the median-of-groups F2 estimate as BIGINT. */
  def amsF2Agg(c: Column, buckets: Int, groups: Int): Column =
    GraftSqlBridge.toColumn(
      AmsF2Agg(GraftSqlBridge.toExpression(c), buckets, groups)
        .toAggregateExpression())
}
