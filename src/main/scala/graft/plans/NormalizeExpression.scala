package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) of a string column as a codegen'd
  * unary expression — Spark ships no built-in for this, and a Scala UDF
  * would break whole-stage codegen in what is otherwise a pure
  * scan-stage cleanup pass. `java.text.Normalizer` ships in the JDK and
  * implements the same canonical/compatibility algorithm as DuckDB's
  * utf8proc (`nfc_normalize`), so NFC output is oracle-checkable
  * bit-for-bit: both sides implement one Unicode standard, not a
  * library-specific heuristic.
  *
  * `form` is the UAX #15 form name: NFC, NFD, NFKC, NFKD.
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects a string column, got ${child.dataType.simpleString}")
    else if (!UnicodeNormalize.forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize form must be one of ${UnicodeNormalize.forms.keys.mkString("/")}, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    UnicodeNormalize.compute(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.plans.UnicodeNormalize.compute($v, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {

  val forms: Map[String, java.text.Normalizer.Form] = Map(
    "NFC" -> java.text.Normalizer.Form.NFC,
    "NFD" -> java.text.Normalizer.Form.NFD,
    "NFKC" -> java.text.Normalizer.Form.NFKC,
    "NFKD" -> java.text.Normalizer.Form.NFKD)

  def compute(text: UTF8String, form: String): UTF8String = {
    val s = text.toString
    // fast path: Normalizer.isNormalized avoids the copy for the common
    // already-normalized case (ASCII short-circuits internally)
    val f = forms(form)
    if (java.text.Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }
}
