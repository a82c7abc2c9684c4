package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity of two vectors.
  *
  * The composed form ([[graft.operators.Ann.cosine]]:
  * `aggregate(zip_with(...))` ×3) is a higher-order expression — Catalyst
  * evaluates those as CodegenFallback, interpreting the lambda per
  * element. This expression runs ONE codegen'd static call with a tight
  * primitive loop; the arithmetic (left-to-right double accumulation of
  * float-widened products, single final division) matches the composed
  * form bit-for-bit, so oracle-checked results are unchanged.
  *
  * Null semantics match the higher-order form: null array, null element,
  * or length mismatch (zip_with pads with null) → null. A zero-norm input
  * returns null (the composed form errors under ANSI; at scale a null is
  * the operable answer — filter upstream if zero vectors are possible).
  *
  * Registered as SQL function `cosine_sim` via [[GraftExtensions]].
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(left) == elemType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> or two array<double>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private lazy val isFloat = elemType(left).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("cos")
      s"""
         |Object $out = graft.plans.CosineSimilarity.compute($a, $b, $isFloat);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $out).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSimilarity {
  /** Kernel invoked from generated code; boxed Double or null. */
  def compute(a: ArrayData, b: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }
}
