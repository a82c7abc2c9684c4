package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeohashSpec extends SparkSpec {
  import spark.implicits._

  private def refGeohash(lon: Double, lat: Double, precision: Int): String =
    GeohashReference.encode(lon, lat, precision)

  test("matches the published vector and the bisection reference") {
    val coords = Seq(
      (10.40744, 57.64911),   // geohash.org example -> u4pruy at precision 6
      (-122.4, 47.6), (0.0, 0.0), (-0.0001, -0.0001),
      (179.9999, 89.9999), (-180.0, -90.0), (2.3488, 48.8534))
    val got = coords.toDF("lon", "lat")
      .select(Geohash.encode(col("lon"), col("lat"), 6).as("g")).as[String].collect().toSeq
    assert(got.head == "u4pruy")
    val want = coords.map { case (lon, lat) => refGeohash(lon, lat, 6) }
    assert(got == want, s"$got vs $want")
  }

  test("prefix nesting: precision-4 hash is a prefix of precision-6") {
    val coords = Seq((10.40744, 57.64911), (-122.4, 47.6), (151.2093, -33.8688))
    val rows = coords.toDF("lon", "lat").select(
      Geohash.encode(col("lon"), col("lat"), 4).as("g4"),
      Geohash.encode(col("lon"), col("lat"), 6).as("g6")).as[(String, String)].collect()
    rows.foreach { case (g4, g6) => assert(g6.startsWith(g4), s"$g6 !startsWith $g4") }
  }

  test("out-of-range coordinates clamp to boundary cells, never wrap") {
    val got = Seq((-999.0, 47.6), (999.0, -999.0), (0.0, 95.0)).toDF("lon", "lat")
      .select(Geohash.encode(col("lon"), col("lat"), 6).as("g")).as[String].collect().toSeq
    // clamped = the hash of the clamped corner coordinate, not garbage
    assert(got(0) == refGeohash(-180.0, 47.6, 6))
    assert(got(1) == refGeohash(179.9999999, -90.0, 6)) // max-bin lon, min lat
    assert(got(2) == refGeohash(0.0, 89.9999999, 6))
  }

  test("odd precisions are rejected (bit would split across axes)") {
    intercept[IllegalArgumentException] { Geohash.encode(lit(0.0), lit(0.0), 5) }
  }
}
