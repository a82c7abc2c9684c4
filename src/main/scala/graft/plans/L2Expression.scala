package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the engine's quantized integer squared
  * L2 distance — the k-means/PQ/Two-NN/kNN metric.
  *
  * The composed form ([[graft.operators.KMeans.quantize]] +
  * `aggregate(zip_with(...))`) is a chain of higher-order expressions:
  * Catalyst evaluates each lambda per element as CodegenFallback AND
  * materializes the intermediate quantized long array per row. This
  * expression is ONE codegen'd static call with a tight primitive loop
  * and no intermediate array. The arithmetic is element-for-element the
  * composed form's — `q = (long) floor(x·scale + 0.5)`, `Σ (qa−qb)²` as
  * long — so every oracle-checked integer distance is unchanged.
  *
  * Null semantics match the higher-order chain: null array or null
  * element → null; a length mismatch (where zip_with would pad with
  * null and the sum collapse to null) → null.
  *
  * Registered as SQL function `l2_sq_q` via [[GraftExtensions]].
  */
case class QuantizedSquaredL2(left: Expression, right: Expression, scale: Double)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(left) == elemType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_sq_q expects two array<float> or two array<double>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private lazy val isFloat = elemType(left).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizedSquaredL2.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("l2q")
      s"""
         |Object $out = graft.plans.QuantizedSquaredL2.compute($a, $b, $isFloat, $scale);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $out).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_sq_q"
}

object QuantizedSquaredL2 {
  /** Kernel invoked from generated code; boxed Long or null. */
  def compute(a: ArrayData, b: ArrayData, isFloat: Boolean, scale: Double): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val qa = math.floor(x * scale + 0.5).toLong
      val qb = math.floor(y * scale + 0.5).toLong
      val d = qa - qb
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
