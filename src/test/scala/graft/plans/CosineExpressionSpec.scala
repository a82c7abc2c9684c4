package graft.plans

import graft.SparkSpec
import graft.operators.Ann
import org.apache.spark.sql.functions._

class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
    (1L, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
    (2L, Seq(0.25f, -0.5f, 0.125f), Seq(-0.75f, 0.33f, 0.9f))
  ).toDF("id", "a", "b")

  test("native cosine matches the composed higher-order form bit-for-bit") {
    val rows = vecs.select(
      Ann.cosine(col("a"), col("b")).as("native"),
      Ann.cosineComposed(col("a"), col("b")).as("composed")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null/mismatch semantics and SQL registration") {
    GraftExtensions.register(spark)
    val r = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS c").first()
    assert(r.isNullAt(0)) // length mismatch -> null (zip_with padding semantics)
    val z = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS c").first()
    assert(z.isNullAt(0)) // zero norm -> null
  }
}
