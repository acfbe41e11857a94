package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the first step of text cleaning (decomposed e + U+0301
  * becomes the single code point é, so hashing/dedup/equality see ONE
  * canonical byte form per semantically-identical text). Spark ships no
  * normalization function, and a Scala UDF would serialize every row
  * through a closure; this stays a codegen'd call whose fast path (the
  * common case: already-NFC ASCII/UTF-8) returns the input UTF8String
  * without allocating.
  *
  * DuckDB's built-in `nfc_normalize` is the oracle twin (both sides
  * implement Unicode UAX #15 canonical composition).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static helper the generated code calls. isNormalized short-circuits
    * without building a new String for the (overwhelmingly common)
    * already-composed input.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
