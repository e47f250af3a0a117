package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization (t10) —
  * the canonicalization step every text-dedup / quality pipeline runs
  * before hashing, so that visually-identical strings ("é" composed
  * vs "e"+U+0301 decomposed) hash identically. The reference corpus
  * arrives through Airbyte/Trino which normalize nothing, so this is
  * a first-class curation primitive, not a convenience.
  *
  * Implementation: `java.text.Normalizer` (the same ICU-derived NFC
  * tables DuckDB's `nfc_normalize` implements), with an ASCII fast
  * path — NFC is the identity on pure-ASCII bytes, and UTF8String
  * exposes that check without decoding, so the overwhelmingly-ASCII
  * common case never allocates a java.lang.String. Codegen keeps the
  * call inside WholeStageCodegen (one static invoke, no UDF
  * serialization, null handling inherited from nullSafeCodeGen).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"nfc_normalize takes a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static so codegen can call it without capturing the expression
    * instance. ASCII fast path: all-ASCII bytes are already NFC. */
  def nfc(s: UTF8String): UTF8String = {
    if (isAscii(s)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}
