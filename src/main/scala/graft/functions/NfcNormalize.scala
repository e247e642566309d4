package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization: `graft_nfc(text)`.
  *
  * The text-pipeline canonicalization step Spark has no builtin for
  * (decomposed sequences like `a` + U+0301 compose to U+00E1, so
  * hashing/dedup/equality see one canonical byte sequence per logical
  * string). DuckDB's `nfc_normalize` is the oracle twin — both sides
  * implement Unicode 15 canonical composition, so results are
  * byte-identical.
  *
  * Why native rather than a UDF: stays inside whole-stage codegen (no
  * Row boxing), and the common case — already-normalized ASCII/NFC
  * text — is detected with `Normalizer.isNormalized` (a quick-check
  * table scan that rejects in O(1) for ASCII) and returns the INPUT
  * UTF8String without any copy or String round trip. Only strings that
  * actually contain decomposed sequences pay the String conversion.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val helper = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String)" +
        s" $helper.normalize($s);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** NFC-normalize; returns the input object unchanged (no allocation)
    * when already normalized — the overwhelmingly common case for
    * ASCII / already-composed corpora.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
