package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DatumSpec extends SparkSpec {
  import spark.implicits._
  import Datum._

  // deterministic global point set (land-ish latitudes, all quadrants)
  private val pts: Seq[(Double, Double)] = for {
    i <- 0 until 10; j <- 0 until 10
  } yield (-170.0 + i * 37.3, -78.0 + j * 16.7)

  test("geodetic -> geocentric anchors: equator/prime meridian and the poles") {
    val (x0, y0, z0) = geodeticToGeocentric(0.0, 0.0, 0.0, Wgs84)
    assert(x0 === Wgs84.a && y0 === 0.0 && z0 === 0.0)
    val (_, _, zN) = geodeticToGeocentric(0.0, 90.0, 0.0, Wgs84)
    assert(math.abs(zN - Wgs84.b) < 1e-6, s"pole Z $zN vs b ${Wgs84.b}")
    // height adds along the normal: equator +100 m is purely radial
    val (xh, _, _) = geodeticToGeocentric(0.0, 0.0, 100.0, Wgs84)
    assert(xh === Wgs84.a + 100.0)
  }

  test("geocentric round trip is sub-millimeter over the global point set") {
    for ((lon, lat) <- pts; h <- Seq(0.0, 250.0)) {
      val (x, y, z) = geodeticToGeocentric(lon, lat, h, Wgs84)
      val (lon2, lat2, h2) = geocentricToGeodetic(x, y, z, Wgs84)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat -> $lat2")
      assert(math.abs(h2 - h) < 1e-3, s"h $h -> $h2 at ($lon, $lat)")
    }
  }

  test("zero-parameter Helmert is the identity; translations apply exactly") {
    val id = Helmert(0, 0, 0, 0, 0, 0, 0)
    assert(helmertShift(1234.5, -6789.0, 42.0, id) === ((1234.5, -6789.0, 42.0)))
    val t = Helmert(10.0, -20.0, 30.0, 0, 0, 0, 0)
    assert(helmertShift(1.0, 2.0, 3.0, t) === ((11.0, -18.0, 33.0)))
  }

  test("full datum shift round-trips through the small-parameter inverse at cm scale") {
    for ((lon, lat) <- pts) {
      val (lon2, lat2, h2) = datumShift(lon, lat, 0.0, Wgs84, Airy1830, Wgs84ToOsgb36)
      val (lon3, lat3, h3) = datumShift(lon2, lat2, h2, Airy1830, Wgs84, Osgb36ToWgs84)
      // the EPSG negate-all-seven inverse is second-order exact: with
      // OSGB36's 450 m / 20 ppm parameters that is ~cm (5e-7 deg),
      // far inside the set's own ~5 m published accuracy
      assert(math.abs(lon3 - lon) < 5e-7, s"lon $lon -> $lon3")
      assert(math.abs(lat3 - lat) < 5e-7, s"lat $lat -> $lat3")
      assert(math.abs(h3) < 0.05, s"h residual $h3")
    }
  }

  test("WGS84 -> OSGB36 moves a London point by the published ~50-200 m band") {
    val (lon2, lat2, _) = datumShift(-0.1278, 51.5074, 0.0, Wgs84, Airy1830, Wgs84ToOsgb36)
    val dMeters = GeoFunctions.haversineMeters(-0.1278, 51.5074, lon2, lat2)
    assert(dMeters > 50.0 && dMeters < 200.0, s"datum offset $dMeters m")
  }

  test("column form == scalar twin bit-for-bit over the global point set") {
    val df = pts.toDF("lon", "lat")
    val (lon2, lat2, h2) = datumShift(col("lon"), col("lat"), lit(0.0),
      Wgs84, Airy1830, Wgs84ToOsgb36)
    val got = df.select(col("lon"), col("lat"), lon2.as("lon2"), lat2.as("lat2"), h2.as("h2"))
      .as[(Double, Double, Double, Double, Double)].collect()
    for ((lon, lat, cLon, cLat, cH) <- got) {
      val (sLon, sLat, sH) = datumShift(lon, lat, 0.0, Wgs84, Airy1830, Wgs84ToOsgb36)
      assert(cLon === sLon, s"lon column/scalar drift at ($lon, $lat)")
      assert(cLat === sLat, s"lat column/scalar drift at ($lon, $lat)")
      assert(cH === sH, s"h column/scalar drift at ($lon, $lat)")
    }
  }

  test("frame helper appends OSGB36 columns") {
    val df = Seq((-0.1278, 51.5074)).toDF("longitude", "latitude")
    val out = toOsgb36(df).collect().head
    assert(math.abs(out.getAs[Double]("lat_osgb36") - 51.5074) < 0.01)
    assert(out.schema.fieldNames.contains("h_osgb36"))
  }
}
