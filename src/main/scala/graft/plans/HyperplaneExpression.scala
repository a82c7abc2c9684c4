package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the random-hyperplane LSH signature of
  * an embedding vector: bit p of the result is set iff the integer dot
  * product of the e6-quantized vector with pseudo-random plane p is
  * non-negative.
  *
  * Replaces the composed form (per plane: `aggregate(zip_with(_qv,
  * slice(<2048-element literal>, 1, size(vec)), ...))`) which is a
  * CodegenFallback higher-order lambda interpreted per element — the
  * signature computation dominated `ann_lsh` wall time. This expression
  * runs ONE codegen'd static call: quantize the vector once, then a tight
  * long-integer loop per plane over a cached component table.
  *
  * Arithmetic is identical to the composed form — q_i = floor(x_i·10^6 +
  * 0.5) as long, plane components from the portable md5-prefix family
  * (h60 mod 2000001 − 10^6), exact long accumulation — so bucket keys
  * are bit-identical on any engine and oracle SQL is unchanged.
  * Bounds: |q| < 2^31, |c| ≤ 10^6 < 2^20, ≤ 2048 dims → |dot| < 2^62,
  * no overflow.
  *
  * Dimension guard: vectors longer than [[HyperplaneSignature.maxDim]]
  * throw at eval (the old form silently null-padded, collapsing every
  * oversized vector into signature 0 — one hot bucket, quadratic
  * candidate blowup). A null vector or null element yields null.
  *
  * Registered as SQL function `hyperplane_sig` via [[GraftExtensions]].
  */
case class HyperplaneSignature(child: Expression, planes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sig expects array<float> or array<double>, got ${child.dataType.simpleString}")
    else if (planes < 1 || planes > 60)
      TypeCheckResult.TypeCheckFailure(s"hyperplane_sig planes must be in [1, 60], got $planes")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val isFloat = elemType.contains(FloatType)

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneSignature.compute(v.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("sig")
      s"""
         |Object $out = graft.plans.HyperplaneSignature.compute($v, $planes, $isFloat);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $out).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSignature {

  /** Max embedding dimensionality covered by the plane tables; longer
    * vectors throw (loud failure instead of a degenerate single bucket).
    */
  val maxDim = 2048

  /** Deterministic integer plane components h_{p,i} ∈ [-10^6, 10^6] from
    * the portable md5("p_i") prefix — data-independent, reproducible
    * symbolically by external engines (see the `sigCte` oracle twin).
    */
  def planeComponents(p: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(maxDim) { i =>
      md.reset()
      val hex = md.digest(s"${p}_$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h60 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      (h60 % 2000001L) - 1000000L
    }
  }

  // per-plane-count component tables, built once per JVM (executors
  // rebuild from the same deterministic family — nothing is shipped)
  private val tables = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Long]]]()
  private def comps(planes: Int): Array[Array[Long]] =
    tables.computeIfAbsent(planes, p => Array.tabulate(p)(planeComponents))

  /** Kernel invoked from generated code; boxed Long or null. */
  def compute(v: ArrayData, planes: Int, isFloat: Boolean): java.lang.Long = {
    val n = v.numElements()
    if (n > maxDim)
      throw new IllegalArgumentException(
        s"hyperplane_sig: embedding dimension $n exceeds the plane table size $maxDim")
    val cs = comps(planes)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      q(i) = math.floor(x * 1000000.0 + 0.5).toLong
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      val c = cs(p)
      var dot = 0L
      var j = 0
      while (j < n) { dot += q(j) * c(j); j += 1 }
      if (dot >= 0L) sig |= 1L << p
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }
}
