package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two sparse vectors held as PARALLEL
  * primitive arrays — sorted ARRAY<BIGINT> keys plus aligned
  * ARRAY<BIGINT> weights per side — via a codegen'd two-pointer merge:
  * O(n+m) per pair with ZERO per-element allocation (primitive
  * `getLong` only). The [[SortedIntersectCount]] pattern for WEIGHTED
  * similarity, hardened twice at the 10× bench: the first q197 verify
  * draft (map_from_entries + aggregate HOF) was CodegenFallback —
  * interpreted, a map allocation per pair, 889 s; the second (struct
  * arrays with STRING keys) allocated an InternalRow per element and
  * compared UTF8Strings per step, and OOM'd the shared 8 g bench heap
  * under 3-rep × multi-query pressure. Keys are the dense token ids of
  * the tf-idf dictionary ([[graft.operators.TextOps]]): a bijection of
  * the token under a deterministic total order, so merging ids is
  * merging tokens. Inputs must be sorted ascending by key and
  * duplicate-free (`sort_array ∘ collect_list` over the per-(doc, key)
  * weight relation upstream).
  */
case class SortedDotLong(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_dot_long"

  override protected def nullSafeEval(ka0: Any, wa0: Any, kb0: Any,
      wb0: Any): Any = {
    val ka = ka0.asInstanceOf[ArrayData]
    val wa = wa0.asInstanceOf[ArrayData]
    val kb = kb0.asInstanceOf[ArrayData]
    val wb = wb0.asInstanceOf[ArrayData]
    val (n, m) = (ka.numElements(), kb.numElements())
    var (i, j) = (0, 0)
    var acc = 0L
    while (i < n && j < m) {
      val x = ka.getLong(i)
      val y = kb.getLong(j)
      if (x == y) { acc += wa.getLong(i) * wb.getLong(j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ka, wa, kb, wb) => {
      val Seq(n, m, i, j, acc, x, y) =
        Seq("n", "m", "i", "j", "acc", "x", "y").map(ctx.freshName)
      s"""
         |int $n = $ka.numElements(); int $m = $kb.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $n && $j < $m) {
         |  long $x = $ka.getLong($i); long $y = $kb.getLong($j);
         |  if ($x == $y) { $acc += $wa.getLong($i) * $wb.getLong($j); $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SortedDotLong =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object SortedDotLong {
  def sortedDotLong(ka: Column, wa: Column, kb: Column, wb: Column): Column =
    GraftSqlBridge.toColumn(SortedDotLong(
      GraftSqlBridge.toExpression(ka), GraftSqlBridge.toExpression(wa),
      GraftSqlBridge.toExpression(kb), GraftSqlBridge.toExpression(wb)))
}
