package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization — the canonicalization step a
  * multilingual corpus pipeline runs before hashing/deduplicating text
  * (a composed "é" and its decomposed "e"+combining-acute form are the
  * SAME text; raw md5/shingle hashes would treat them as different
  * documents and every dedup/contamination operator downstream would
  * miss the pair).
  *
  * Spark has no built-in normalizer; the JDK does (java.text.Normalizer,
  * ICU-backed tables). Same extension rationale as [[DotProduct]]: a
  * Scala UDF would fall out of whole-stage codegen and pay
  * encoder/boxing costs per row — this expression stays codegen'd, with
  * an `isNormalized` fast path so the (overwhelmingly common) already-
  * NFC row costs one scan and zero allocation.
  *
  * Registered as SQL function `graft_nfc` by [[graft.GraftExtensions]];
  * DuckDB's `nfc_normalize` is the oracle mirror (q_normalize).
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string, got $t")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NormalizeNfc.nfc(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeNfc.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Shared by interpreted eval and generated code. The isNormalized
    * probe avoids the String round-trip for already-NFC input. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
