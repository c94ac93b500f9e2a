package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash `h = fold(h*base + byte mod m)` over a string's
  * UTF-8 bytes — the document-fingerprinting primitive (SURVEY.md §2.2
  * north-star "document fingerprinting (rolling hash)").
  *
  * A native Catalyst `Expression` with `doGenCode`, not a Scala UDF: the
  * loop is inlined into whole-stage codegen, so fingerprinting a 100 TB
  * documents table stays in a single generated operator with no
  * serialization boundary. Chosen over `aggregate(split(...))` HOFs for
  * the hot path; the DuckDB oracle reproduces it with a `list_reduce`
  * char fold (identical for ASCII text; this operates on UTF-8 bytes).
  */
case class RollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${base}L + ($bytes[$i] & 0xff)) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val DefaultBase = 31L
  val DefaultMod = 1000000007L

  /** SimHash-oriented variant: wider modulus giving 48 usable bits while
    * keeping `h*base + b` safely inside Int64 (base 131: max ≈ 1.3e17).
    */
  val WideBase = 131L
  val WideMod = 1000000000000037L

  def rollingHash(c: Column, base: Long = DefaultBase, mod: Long = DefaultMod): Column =
    GraftSqlBridge.toColumn(RollingHash(GraftSqlBridge.toExpression(c), base, mod))

  /** The equivalent DuckDB SQL fragment (char-based fold; identical to the
    * byte fold for ASCII input). `sfx` de-collides lambda variable names
    * when this fragment is nested inside another DuckDB lambda.
    */
  def duckSql(expr: String, base: Long = DefaultBase, mod: Long = DefaultMod,
      sfx: String = ""): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       list_transform(range(1, length($expr)+1),
         i$sfx -> CAST(ascii(substr($expr, CAST(i$sfx AS INT), 1)) AS BIGINT))),
       (a$sfx, b$sfx) -> (a$sfx*$base + b$sfx) % $mod)"""
}
