package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the k-means / PQ centroid argmin over a
  * driver-literal codebook — the inner loop of every coarse/sub-quantizer
  * assignment ([[graft.operators.KMeans.nearestScored]]).
  *
  * The composed form — `least(struct(aggregate(zip_with(q, centLit, ...)),
  * id), ...)` with one struct per centroid — is a chain of k higher-order
  * expressions: Catalyst evaluates every zip_with/aggregate lambda
  * per element as CodegenFallback (an interpreted function call per
  * dimension per centroid per row) and allocates k intermediate arrays
  * and structs per row. This expression is ONE codegen'd static call with
  * a tight primitive k×dim loop and no per-row allocation beyond the
  * 2-field result.
  *
  * Semantics are replicated exactly from the composed form (spec-pinned):
  *   - distance per centroid = Σ (q(i) − c(i))² in wrapping long
  *     arithmetic, identical to `(a-b)*(a-b)` under zip_with + aggregate;
  *   - result = struct(d, c) of the minimum under Spark's struct
  *     ordering — ties on d break to the lowest centroid id;
  *   - a null input array, a null element, or a length mismatch makes
  *     that distance null, and null d sorts FIRST in struct ordering, so
  *     the result is struct(null, lowest such id) — the exact `least`
  *     behavior (structs themselves are never null, so `least` skips
  *     nothing).
  *
  * MIXED-LENGTH CODEBOOKS ARE OUT OF CONTRACT (enforced below): with one
  * shared centroid length, an input either matches every centroid or none,
  * so the mismatch-null path can never mask a later centroid's ANSI
  * overflow the way it could on a ragged codebook (compute() short-
  * circuits once a mismatch is seen; the composed chain would keep
  * evaluating and throw — r15 ADVICE.md). Every trainer already produces
  * rectangular codebooks ([[graft.operators.Ann.pqTrainCore]] requires it).
  */
case class ArgminQuantizedL2(child: Expression, cents: Array[Array[Long]])
  extends UnaryExpression {

  require(cents.nonEmpty, "argmin needs at least one centroid")
  require(cents.forall(_.length == cents(0).length),
    "argmin codebook must be rectangular (mixed centroid lengths are out of contract)")

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = true),
    StructField("c", LongType, nullable = false)))

  // the composed least(struct(...), ...) never returns a null struct —
  // null inputs surface as a null d field, not a null result
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmin_l2_q expects array<bigint> (a quantized vector), got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val q = child.eval(input)
    ArgminQuantizedL2.compute(q.asInstanceOf[ArrayData], cents)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code.toString}
        |InternalRow ${ev.value} = graft.plans.ArgminQuantizedL2.compute(
        |  ${childGen.isNull} ? null : ${childGen.value}, $centsRef);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArgminQuantizedL2 {

  /** Shared by interpreted eval and codegen. Returns the (d, c) row; d is
    * null (and c the lowest offending id) when the input is null, has a
    * null element, or mismatches a centroid's length — mirroring the
    * null-propagation of zip_with + aggregate under struct-least.
    */
  def compute(q: ArrayData, cents: Array[Array[Long]]): InternalRow = {
    // null input: every distance is null; least picks (null, 0)
    if (q == null) return InternalRow(null, 0L)
    val n = q.numElements()
    var i = 0
    while (i < n) { // a null element nulls every centroid's distance
      if (q.isNullAt(i)) return InternalRow(null, 0L)
      i += 1
    }
    val qa = q.toLongArray()
    var bestD = 0L
    var bestC = -1L
    var nullC = -1L
    var ci = 0
    while (ci < cents.length) {
      val cv = cents(ci)
      if (cv.length != n) {
        if (nullC < 0) nullC = ci.toLong // null d sorts first; lowest id wins
      } else if (nullC < 0) {
        var d = 0L
        var j = 0
        while (j < n) {
          // exact arithmetic: ANSI mode (Spark 4 default) makes the
          // composed zip_with chain THROW on long overflow, so the
          // kernel fails just as loudly instead of silently wrapping
          // (out of contract for quantized embeddings — |q| ≤ ~4e6 and
          // dims ≤ 1e4 keep Σ(Δ)² under 2^62 — but never silent)
          val t = Math.subtractExact(qa(j), cv(j))
          d = Math.addExact(d, Math.multiplyExact(t, t))
          j += 1
        }
        if (bestC < 0 || d < bestD) { bestD = d; bestC = ci.toLong }
      }
      ci += 1
    }
    if (nullC >= 0) InternalRow(null, nullC) else InternalRow(bestD, bestC)
  }
}
