package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoFunctionsSpec extends SparkSpec {

  test("haversine matches the reference's documented value") {
    // reference doctest: point_haversine_dist(8.5, 47.3, 8.7, 47.2) ≈ 18749.056
    val d = GeoFunctions.haversineMeters(8.5, 47.3, 8.7, 47.2)
    assert(math.abs(d - 18749.056277719905) < 1e-6)
  }

  test("haversine column expression equals scalar version") {
    import spark.implicits._
    val df = Seq((8.5, 47.3, 8.7, 47.2), (0.0, 0.0, 0.0, 0.0), (179.9, 10.0, -179.9, 10.0))
      .toDF("lon1", "lat1", "lon2", "lat2")
    val got = df.select(GeoFunctions.haversineMeters(col("lon1"), col("lat1"), col("lon2"), col("lat2")))
      .as[Double].collect()
    val want = Seq(
      GeoFunctions.haversineMeters(8.5, 47.3, 8.7, 47.2), 0.0,
      GeoFunctions.haversineMeters(179.9, 10.0, -179.9, 10.0))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
  }

  test("identical points give exactly zero (acos clamp)") {
    assert(GeoFunctions.haversineMeters(8.5, 47.3, 8.5, 47.3) == 0.0)
  }

  test("linestring length = sum of segment haversines; degenerate cases are 0") {
    import spark.implicits._
    val df = Seq(
      Seq((8.5, 47.3), (8.7, 47.2), (8.5, 47.3)),
      Seq((8.5, 47.3)),
      Seq.empty[(Double, Double)]
    ).toDF("raw")
      .select(expr("transform(raw, p -> struct(p._1 as lon, p._2 as lat))").as("points"))
    val got = df.select(GeoFunctions.linestringLengthMeters(col("points"))).as[Double].collect()
    assert(math.abs(got(0) - 2 * 18749.056277719905) < 1e-5)
    assert(got(1) == 0.0 && got(2) == 0.0)
  }

  test("meters to decimal degrees matches reference formula") {
    val d = GeoFunctions.metersToDecimalDegrees(500.0, 47.41)
    assert(math.abs(d - 500.0 / (111320.0 * math.cos(math.toRadians(47.41)))) < 1e-12)
  }

  test("point in polygon: square ring") {
    val ring = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))
    assert(GeoFunctions.pointInPolygon(0.5, 0.5, ring))
    assert(!GeoFunctions.pointInPolygon(1.5, 0.5, ring))
    assert(!GeoFunctions.pointInPolygon(-0.1, 0.0, ring))
  }

  test("convex hull of a square plus interior point drops the interior") {
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.5, 0.5))
    val hull = GeoFunctions.convexHull(pts)
    assert(hull.toSet == Set((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)))
  }

  test("wrap-aware centroid handles the antimeridian") {
    import spark.implicits._
    val df = Seq((179.0, 0.0), (-179.0, 0.0)).toDF("lon", "lat")
    val c = df.agg(GeoFunctions.wrapAwareMeanLon(avg(sin(radians(col("lon")))), avg(cos(radians(col("lon"))))))
      .as[Double].first()
    assert(math.abs(math.abs(c) - 180.0) < 1e-9) // ±180, not 0
  }
}
