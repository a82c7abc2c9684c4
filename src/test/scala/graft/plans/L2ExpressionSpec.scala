package graft.plans

import graft.SparkSpec
import graft.operators.Ann
import org.apache.spark.sql.functions._

class L2ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
    (1L, Seq(1.0f, 0.0f, -0.5f), Seq(0.0f, 1.0f, 0.25f)),
    (2L, Seq(0.25f, -0.5f, 0.125f), Seq(-0.75f, 0.33f, 0.9f)),
    (3L, Seq(1.9999995f, 0.0f, 0.0f), Seq(-1.9999995f, 0.0f, 0.0f)) // rounding edge
  ).toDF("id", "a", "b")

  test("native quantized L2 equals the composed quantize + zip_with + aggregate chain") {
    def quantize(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x * 1e6 + lit(0.5)).cast("long"))
    val composed = aggregate(
      zip_with(quantize(col("a")), quantize(col("b")), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val rows = vecs.select(
      Ann.quantizedL2(col("a"), col("b")).as("native"), composed.as("composed")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // identical vectors -> exactly zero
    assert(rows(0).getLong(0) == 0L)
  }

  test("null/mismatch semantics and SQL registration") {
    GraftExtensions.register(spark)
    val r = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .selectExpr("l2_sq_q(a, b, 1e6) AS d").first()
    assert(r.isNullAt(0)) // length mismatch -> null (zip_with padding semantics)
    val v = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
      .selectExpr("l2_sq_q(a, b, 1e6) AS d").first()
    assert(v.getLong(0) == 2L * 1000000L * 1000000L)
  }
}
