package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector arithmetic over ARRAY<FLOAT>/ARRAY<DOUBLE> columns.
  *
  * Spark's higher-order `aggregate()`/`zip_with()` lambdas are evaluated
  * interpreted (no whole-stage codegen), which makes an all-pairs cosine
  * join pay lambda-dispatch per element per pair — the q49 bench showed
  * 70s at sf0.1 for 2M pairs. This expression compiles to a tight
  * generated loop (`acc += (double)a[i] * (double)b[i]`, ascending — the
  * same left-to-right fold as DuckDB's `list_reduce`, so results stay
  * bit-identical to the oracle SQL).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // can produce NULL (length mismatch) even for non-null inputs
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getElem(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case other => throw new IllegalArgumentException(s"dot_product: $other")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    // mismatched dimensionality is data corruption: return NULL (the
    // DuckDB oracle's out-of-range list access does the same) rather
    // than a confidently wrong partial dot product
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += getElem(a, ta, i) * getElem(b, tb, i)
      i += 1
    }
    acc
  }

  private def accessor(t: DataType, v: String, i: String): String = t match {
    case FloatType => s"(double) $v.getFloat($i)"
    case DoubleType => s"$v.getDouble($i)"
    case other => throw new IllegalArgumentException(s"dot_product: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${accessor(elemType(left), a, i)} * ${accessor(elemType(right), b, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VecOps {
  /** Codegen'd dot product of two array columns (float or double elems). */
  def dotF(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(
      DotProduct(GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))

  /** Codegen'd L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dotF(a, a))
}
