package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[NfcNormalize]] — a plain object so whole-stage
  * codegen can call it through the Scala static forwarder
  * (`graft.functions.NfcUtil.nfc(...)` is valid generated Java).
  */
object NfcUtil {

  /** Unicode NFC canonical composition. Fast path: `isNormalized` scans
    * without allocating, and web-scale text is overwhelmingly already
    * NFC — the common row costs one scan and returns the input
    * UTF8String unchanged (no decode, no re-encode).
    */
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonicalization pass every multilingual corpus needs before
  * hashing/dedup (the same logical text arrives composed from one crawl
  * and decomposed from another; un-normalized, exact dedup and token
  * counts silently treat them as different documents). Spark has no
  * built-in normalizer; the alternatives are a Scala UDF (breaks
  * codegen, serializes the row) or normalizing outside the engine. This
  * stays inside whole-stage codegen with one JDK `Normalizer` call per
  * row and an allocation-free fast path for already-normalized text.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${t.sql}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}
