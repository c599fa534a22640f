package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for text canonicalization ahead of hashing/dedup:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are byte-different
  * but render identically — content-hash dedup and shingle matching MUST
  * see one canonical byte form or visually-identical documents never
  * collide. NFC (canonical composition) is the interchange default and is
  * what DuckDB's `nfc_normalize` implements, making the engine's form
  * oracle-checkable.
  *
  * Spark has no built-in for this (the one genuinely missing string
  * canonicalization primitive), hence a native expression: map-side,
  * single static call under codegen, null-propagating. ASCII fast path:
  * `Normalizer.isNormalized` is O(n) with no allocation for the common
  * already-NFC case.
  */
object UnicodeExpressions {

  def computeNfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires string input, got $other")
    }

    override def nullSafeEval(v: Any): Any =
      computeNfc(v.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.UnicodeExpressions.computeNfc($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "nfc_normalize"
  }

  def nfc_normalize(c: Column): Column =
    bridge.column(NfcNormalize(bridge.expression(c)))
}
