package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval helper — a plain object so generated Java can call it as a
  * static method (`graft.functions.Nfc.nfc(...)`).
  */
object Nfc {
  /** Unicode NFC canonical composition. Fast path: `isNormalized` is a
    * cheap scan (always true for ASCII), so the common case allocates
    * nothing and returns the input UTF8String unchanged.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd Unicode NFC normalization of a string column.
  *
  * Text corpora mix composed and decomposed forms of the same characters
  * ("é" as U+00E9 vs "e"+U+0301); every dedup / fingerprint / token
  * operator in this engine compares strings byte-wise, so normalization
  * must run FIRST or visually-identical documents hash apart. Spark has no
  * built-in for it; a Scala UDF would box every row and block whole-stage
  * codegen, so this is a native unary expression: the generated code calls
  * one static helper, stays inside the codegen stage, and the ASCII fast
  * path (the overwhelming majority of bytes at corpus scale) allocates
  * nothing.
  *
  * Null → null. Agrees with DuckDB's `nfc_normalize` (both implement
  * Unicode canonical composition), which is what the q78 oracle checks.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Nfc.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Nfc.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
