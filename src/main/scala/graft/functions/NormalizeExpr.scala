package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side worker kept out of the generated code so codegen emits one
  * static call (the [[Blake2sHexExpr]] pattern). */
object Normalize {
  def normalize(s: UTF8String, form: String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form)))
}

/** Unicode normalization as a codegen'd Catalyst expression — Spark has no
  * built-in NFC/NFKC, yet canonical normalization is the FIRST step of any
  * text-dedup pipeline (visually identical strings with different codepoint
  * sequences must hash identically before exact/MinHash dedup sees them).
  * `graft_nfc` / `graft_nfkc` in SQL; oracle twin: DuckDB `nfc_normalize`.
  *
  * A UDF here would kick the surrounding projection out of whole-stage
  * codegen exactly like the hash exprs; this stays fused. */
case class NormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_${form.toLowerCase}"

  override protected def nullSafeEval(s: Any): Any =
    Normalize.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Normalize.normalize($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
