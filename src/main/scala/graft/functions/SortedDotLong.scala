package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two sparse vectors held as SORTED
  * ARRAY<STRUCT<key STRING, weight BIGINT>> columns, via a codegen'd
  * two-pointer merge — O(n+m) per pair with no per-row map or closure
  * allocation. The [[SortedIntersectCount]] pattern for WEIGHTED
  * similarity: the first draft of q197's candidate verify used
  * `map_from_entries` + the `aggregate` HOF, which is CodegenFallback
  * (the q70 interpreted-eval lesson) and allocated a map per pair —
  * measured as the dominant cost of the verify at the 10× bench.
  * Inputs must be sorted ascending by key and duplicate-free
  * (`sort_array ∘ collect_list` over a per-(doc, key) aggregate
  * upstream); keys compare as UTF8 binary, the same order `sort_array`
  * uses on the struct's first field, so the merge sees both sides in
  * one consistent order.
  */
case class SortedDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_dot_long"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (n, m) = (a.numElements(), b.numElements())
    var (i, j) = (0, 0)
    var acc = 0L
    while (i < n && j < m) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val cmp = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (cmp == 0) { acc += ra.getLong(1) * rb.getLong(1); i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(n, m, i, j, acc, ra, rb, cmp) =
        Seq("n", "m", "i", "j", "acc", "ra", "rb", "cmp").map(ctx.freshName)
      val row = classOf[InternalRow].getName
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $n && $j < $m) {
         |  $row $ra = $a.getStruct($i, 2);
         |  $row $rb = $b.getStruct($j, 2);
         |  int $cmp = $ra.getUTF8String(0).compareTo($rb.getUTF8String(0));
         |  if ($cmp == 0) { $acc += $ra.getLong(1) * $rb.getLong(1); $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedDotLong =
    copy(left = newLeft, right = newRight)
}

object SortedDotLong {
  def sortedDotLong(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(SortedDotLong(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
}
