package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** LZ76 phrase count of (the first `maxChars` characters of) a string, as
  * a codegen'd unary expression — the compression-density quality signal
  * of training-data pipelines (highly repetitive/templated pages parse
  * into few phrases; a gzip-ratio filter's principled, engine-portable
  * twin — zlib is not available to an external SQL oracle, an LZ76 parse
  * is).
  *
  * Parsing convention is pinned to [[graft.operators.Metrics.lzComplexity]]
  * (Kontoyiannis et al. 1998): scanning left to right, each phrase is the
  * shortest prefix of the remaining text that does NOT occur as a
  * substring starting strictly before the cursor (the source may overlap
  * the phrase); the final phrase may be a bare repeat.
  *
  * The parse operates on Unicode code points (what DuckDB's `substring`/
  * `strpos` count), not UTF-16 units, so the oracle recursion sees the
  * identical sequence. The O(cap²) direct scan with early exit is bounded
  * by `maxChars` (a plan-time constant), keeping the per-row cost flat
  * regardless of document length.
  */
case class Lz76PhraseCount(child: Expression, maxChars: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"lz76_phrase_count expects a string column, got ${child.dataType.simpleString}")
    else if (maxChars < 1)
      TypeCheckResult.TypeCheckFailure(s"lz76_phrase_count maxChars must be >= 1, got $maxChars")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    Lz76PhraseCount.compute(v.asInstanceOf[UTF8String], maxChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.plans.Lz76PhraseCount.compute($v, $maxChars);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lz76_phrase_count"
}

object Lz76PhraseCount {

  def compute(text: UTF8String, maxChars: Int): Long = {
    val all = text.toString.codePoints().toArray
    val n = math.min(all.length, maxChars)
    var p = 0
    var c = 0L
    while (p < n) {
      var best = 0
      var q = 0
      while (q < p) {
        var l = 0
        val cap = n - p
        while (l < cap && all(q + l) == all(p + l)) l += 1
        if (l > best) best = l
        q += 1
      }
      p += math.min(best + 1, n - p)
      c += 1L
    }
    c
  }
}
