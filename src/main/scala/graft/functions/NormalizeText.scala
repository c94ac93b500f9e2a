package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC/NFKC) as a native Catalyst
  * expression — the text-canonicalization stage a multilingual corpus
  * needs BEFORE fingerprinting/dedup: the same visible string arrives
  * from different crawls as precomposed (é) or decomposed (e + U+0301)
  * codepoints, and every byte-level fingerprint (RollingHash, SimHash,
  * MinHash shingles) would treat them as distinct documents.
  *
  * Spark ships no normalization builtin; a Scala UDF would break
  * whole-stage codegen on exactly the full-corpus pass where it hurts.
  * This expression stays inside codegen via a static call into the
  * JDK's `java.text.Normalizer` (ASCII fast path first — the normalizer
  * allocates even for a no-op, and most corpus bytes are ASCII).
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  require(form == "NFC" || form == "NFKC", s"unsupported form $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NormalizeText.normalize($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** Static entry shared by eval and generated code. The ASCII check is
    * the hot path: pure byte scan, no allocation, no JDK normalizer.
    */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) s
    else UTF8String.fromString(Normalizer.normalize(s.toString,
      if (form == "NFKC") Normalizer.Form.NFKC else Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    GraftSqlBridge.toColumn(NormalizeText(GraftSqlBridge.toExpression(c), "NFC"))

  def nfkc(c: Column): Column =
    GraftSqlBridge.toColumn(NormalizeText(GraftSqlBridge.toExpression(c), "NFKC"))
}
