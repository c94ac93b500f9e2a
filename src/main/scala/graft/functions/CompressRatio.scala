package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio (compressed bytes / raw bytes) of a string
  * — the classic "too compressible ⇒ boilerplate/repetition" corpus
  * quality signal (used alongside the Gopher rule battery). Highly
  * repetitive text compresses far below natural prose, so a low ratio
  * flags degenerate documents that token-level heuristics (q97's bigram
  * ratio) can miss at longer repeat periods.
  *
  * A native expression for the same reason as [[RollingHash]]: this
  * runs once per document over the full corpus — a UDF would break
  * whole-stage codegen exactly there. The Deflater is allocated per
  * call (it is not thread-safe, and codegen'd operators are
  * concurrent); level is pinned so results are stable per zlib build.
  * Ratios are deterministic within a JVM but NOT a cross-engine
  * contract — consumers threshold them (spec-bounded, not
  * oracle-hashed).
  */
case class CompressRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "compress_ratio"

  override protected def nullSafeEval(input: Any): Any =
    CompressRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressRatio.ratio($c);")

  override protected def withNewChildInternal(newChild: Expression): CompressRatio =
    copy(child = newChild)
}

object CompressRatio {

  /** compressed/raw byte ratio; 1.0 for the empty string (nothing to
    * compress — neutral, never "suspiciously compressible").
    */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](64)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }

  def compressRatio(c: Column): Column =
    GraftSqlBridge.toColumn(CompressRatio(GraftSqlBridge.toExpression(c)))
}
