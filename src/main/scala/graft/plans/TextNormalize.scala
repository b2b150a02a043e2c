package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Real crawl text mixes precomposed ("é") and decomposed ("e" + U+0301)
  * forms of the same grapheme; every downstream equality — exact dedup
  * digests, shingle hashes, vocabulary counts — silently splits on the
  * difference unless ingestion canonicalizes. Spark ships no normalizer
  * built-in; a Scala UDF would box every row and block codegen fusion, so
  * this wraps `java.text.Normalizer` (ICU-grade, in the JDK) as a proper
  * Catalyst expression: whole-stage codegen emits a static call, and the
  * fast path returns the INPUT UTF8String untouched when it is already
  * normalized (the overwhelmingly common case — `isNormalized` is a cheap
  * scan with an ASCII short-circuit, no allocation).
  *
  * DuckDB's `nfc_normalize` implements the same Unicode canonical
  * composition, so oracles compare digests of the normalized bytes
  * directly.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column wrapper. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
