package graft.plans

import graft.SparkSpec
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

class HaversineExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the composed-builtin form exactly, incl. nulls") {
    GraftExtensions.register(spark)
    val df = Seq(
      (Some(8.5), Some(47.3), Some(8.7), Some(47.2)),
      (Some(0.0), Some(0.0), Some(0.0), Some(0.0)),
      (Some(179.9), Some(10.0), Some(-179.9), Some(10.0)),
      (None, Some(47.3), Some(8.7), Some(47.2))
    ).toDF("lon1", "lat1", "lon2", "lat2")

    val out = df.select(
      expr("haversine_m(lon1, lat1, lon2, lat2)").as("native"),
      GeoFunctions.haversineMeters(col("lon1"), col("lat1"), col("lon2"), col("lat2")).as("composed"))
      .collect()

    out.foreach { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) assert(r.isNullAt(0) && r.isNullAt(1))
      else assert(r.getDouble(0) == r.getDouble(1)) // bit-identical
    }
  }

  test("expression participates in whole-stage codegen") {
    GraftExtensions.register(spark)
    // non-foldable input (range) so the projection can't constant-fold
    val df = spark.range(1)
      .selectExpr("haversine_m(8.5 + cast(id as double), 47.3d, 8.7d, 47.2d) as h")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project")) // the * marks a WholeStageCodegen stage
    assert(math.abs(df.as[Double].first() - 18749.056277719905) < 1e-6)
  }
}
