package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Native Theta sketch aggregate (Dasgupta, Lang, Rhodes & Thorup,
  * "Theta sketch framework", 2016 — the DataSketches library Spark
  * already ships for its `hll_sketch_agg` functions): a bounded
  * sample of the k smallest key hashes below a threshold θ, folded
  * over a stream of LONG keys. Where HLL (q19/q176) answers only
  * |A| and |A∪B|, the theta retained-hash set supports the full
  * distinct-count SET ALGEBRA — |A∩B| and |A∖B| — because the k
  * smallest hashes of A∪B are a uniform sample of the union on which
  * membership in A and B is observable. That is the estimator
  * audience/overlap analytics need at 100 TB, where exact per-segment
  * `COUNT(DISTINCT)` intersections would shuffle the full key domain
  * per segment pair.
  *
  * State is one `Union` of nominal 2^lgNom entries — constant-size,
  * mergeable, partial-aggregation-friendly. Determinism: the update
  * hash is seeded (library default seed) and `Union.getResult` cuts
  * the retained set back to the canonical k smallest hashes, so the
  * emitted bytes are a pure function of the input SET — independent
  * of row order and partitioning (the cpus-7-vs-32 determinism gate
  * and ThetaSketchSpec's repartition case both pin this).
  *
  * Output: the ordered compact sketch serialization (BinaryType) —
  * feed [[ThetaSetOp]] / [[ThetaInBounds]] downstream.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgNom: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgNom >= 4 && lgNom <= 26, "theta sketch needs 4 <= lgNom <= 26")

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  // an empty group is a valid empty sketch, never null
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgNom).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult(true, null))
    b1
  }

  override def eval(buf: Union): Any = buf.getResult(true, null).toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

object ThetaSketchAgg {
  /** `theta_sketch_agg(keyCol)` as a Column aggregate returning the
    * ordered compact sketch bytes.
    */
  def thetaSketchAgg(c: Column, lgNom: Int): Column =
    GraftSqlBridge.toColumn(
      ThetaSketchAgg(GraftSqlBridge.toExpression(c), lgNom)
        .toAggregateExpression())
}

/** Union-merge aggregate over ALREADY-BUILT sketches: folds a column of
  * serialized theta sketches into their union — the re-aggregation
  * operator that makes a persisted per-day sketch table answer any
  * coarser-grained distinct question (weekly, rolling, per-segment)
  * without re-reading raw data. Union's canonical cutback makes the
  * emitted bytes a pure function of the union SET, so merging per-day
  * sketches is bit-identical to sketching the raw keys of the window
  * directly (ThetaSketchSpec pins the equality).
  */
case class ThetaMergeAgg(
    child: Expression,
    lgNom: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgNom >= 4 && lgNom <= 26, "theta sketch needs 4 <= lgNom <= 26")

  override def prettyName: String = "theta_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgNom).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(CompactSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult(true, null))
    b1
  }

  override def eval(buf: Union): Any = buf.getResult(true, null).toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaMergeAgg =
    copy(child = newChildren.head)
}

object ThetaMergeAgg {
  /** `theta_merge_agg(sketchCol)`: the union of a column of sketches. */
  def thetaMergeAgg(c: Column, lgNom: Int): Column =
    GraftSqlBridge.toColumn(
      ThetaMergeAgg(GraftSqlBridge.toExpression(c), lgNom)
        .toAggregateExpression())
}

/** Static helpers the scalar theta expressions call — plain (codegen'd
  * call sites reference them as static methods, so the expressions stay
  * inside whole-stage codegen even though the sketch math itself is
  * library code).
  */
object ThetaOps {
  private def heap(b: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(b))

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(heap(a))
    i.intersect(heap(b))
    i.getResult(true, null).toByteArray
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = SetOperation.builder().buildUnion()
    u.union(heap(a))
    u.union(heap(b))
    u.getResult(true, null).toByteArray
  }

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(heap(a), heap(b)).compact(true, null).toByteArray

  def inBounds(sketch: Array[Byte], exact: Long, numStd: Int): Boolean = {
    val s = heap(sketch)
    exact >= s.getLowerBound(numStd) && exact <= s.getUpperBound(numStd)
  }
}

/** Scalar theta set operation over two serialized sketches: `op` is one
  * of `intersect` / `union` / `anotb` (A∖B). Inputs and output are the
  * ordered compact representation [[ThetaSketchAgg]] emits; results are
  * canonical, so chaining ops stays deterministic.
  */
case class ThetaSetOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression {

  require(ThetaSetOp.ops.contains(op), s"unknown theta set op: $op")

  override def dataType: DataType = BinaryType
  override def prettyName: String = s"theta_$op"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    op match {
      case "intersect" => ThetaOps.intersect(a, b)
      case "union"     => ThetaOps.union(a, b)
      case "anotb"     => ThetaOps.aNotB(a, b)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = op match {
      case "intersect" => "intersect"
      case "union"     => "union"
      case "anotb"     => "aNotB"
    }
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ThetaOps.$method($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOp =
    copy(left = newLeft, right = newRight)
}

object ThetaSetOp {
  private[functions] val ops = Set("intersect", "union", "anotb")

  def thetaIntersect(a: Column, b: Column): Column = mk(a, b, "intersect")
  def thetaUnion(a: Column, b: Column): Column = mk(a, b, "union")
  def thetaANotB(a: Column, b: Column): Column = mk(a, b, "anotb")

  private def mk(a: Column, b: Column, op: String): Column =
    GraftSqlBridge.toColumn(ThetaSetOp(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b), op))
}

/** `theta_in_bounds(sketchBytes, exactCount)` — TRUE iff the exact
  * count sits inside the sketch's ±`numStd`·σ confidence bounds. The
  * gate-facing shape of the estimate (the q19/q176 contract pattern):
  * the OUTPUT column is an exact-arithmetic boolean both engines can
  * agree on, while the estimate itself stays internal.
  */
case class ThetaInBounds(left: Expression, right: Expression, numStd: Int)
    extends BinaryExpression {

  require(numStd >= 1 && numStd <= 3, "theta bounds support 1..3 std devs")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "theta_in_bounds"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ThetaOps.inBounds(l.asInstanceOf[Array[Byte]],
      r.asInstanceOf[Long], numStd)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) =>
      s"${ev.value} = graft.functions.ThetaOps.inBounds($a, $n, $numStd);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaInBounds =
    copy(left = newLeft, right = newRight)
}

object ThetaInBounds {
  def thetaInBounds(sketch: Column, exact: Column, numStd: Int): Column =
    GraftSqlBridge.toColumn(ThetaInBounds(
      GraftSqlBridge.toExpression(sketch),
      GraftSqlBridge.toExpression(exact), numStd))
}
