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

/** Codegen'd in-document stutter collapse: drops every space-separated
  * word equal to its immediate predecessor ("batch batch batch" ->
  * "batch") in ONE pass over the string. Same extension rationale as
  * [[NormalizeNfc]]: the higher-order-function spelling
  * (`filter(ws, (x, i) -> ...)`) is interpreted per element — measured
  * ~2.3 s over sf0.1 documents vs staying inside whole-stage codegen
  * here. Registered as SQL function `graft_destutter`; the oracle
  * mirror is DuckDB's `list_filter` lambda (q_destutter). */
case class Destutter(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_destutter requires string, got $t")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "graft_destutter"

  override def nullSafeEval(s: Any): Any =
    Destutter.destutter(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Destutter.destutter($c)")

  override protected def withNewChildInternal(newChild: Expression): Destutter =
    copy(child = newChild)
}

object Destutter {
  /** One pass; empty segments (double spaces) are words like any other
    * — semantics identical to `filter(split(s, ' '), (x, i) -> i = 0 OR
    * x != prev)` re-joined with single spaces. Stutter-free input
    * returns the INPUT object (zero allocation on the common path). */
  def destutter(s: UTF8String): UTF8String = {
    val str = s.toString
    val parts = str.split(" ", -1)
    var stutter = false
    var i = 1
    while (i < parts.length && !stutter) {
      if (parts(i) == parts(i - 1)) stutter = true
      i += 1
    }
    if (!stutter) return s
    val sb = new java.lang.StringBuilder(str.length)
    var prev: String = null
    var first = true
    parts.foreach { w =>
      if (prev == null || w != prev) {
        if (!first) sb.append(' ')
        sb.append(w)
        first = false
      }
      prev = w
    }
    UTF8String.fromString(sb.toString)
  }
}
