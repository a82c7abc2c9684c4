package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalProjectionsSpec extends SparkSpec {
  import spark.implicits._
  import ConformalProjections._

  // Snyder 1987, Map Projections — A Working Manual, numerical example
  // pp. 295-297: LCC 2SP on Clarke 1866, stdpar 33°/45°, origin 23°N 96°W
  private val snyderLcc = Lcc2sp(a = 6378206.4, invF = 294.978698214,
    lat1Deg = 33.0, lat2Deg = 45.0, lat0Deg = 23.0, lon0Deg = -96.0,
    falseEasting = 0.0, falseNorthing = 0.0, crs = "SNYDER-LCC")

  test("Snyder LCC 2SP worked example: 35N 75W -> (1894410.9, 1564649.5) m") {
    val (x, y) = snyderLcc.forwardScalar(-75.0, 35.0)
    assert(math.abs(x - 1894410.9) < 0.5, s"x $x")
    assert(math.abs(y - 1564649.5) < 0.5, s"y $y")
  }

  test("EPSG GN7-2 Lambert 2SP worked example (NAD27 Texas South Central, US feet)") {
    // a in US survey feet; published: E 2963503.91, N 254759.80 ftUS
    val tx = Lcc2sp(a = 20925832.16, invF = 294.978698214,
      lat1Deg = 28.0 + 23.0 / 60.0, lat2Deg = 30.0 + 17.0 / 60.0,
      lat0Deg = 27.0 + 50.0 / 60.0, lon0Deg = -99.0,
      falseEasting = 2000000.0, falseNorthing = 0.0)
    val (e, n) = tx.forwardScalar(-96.0, 28.5)
    assert(math.abs(e - 2963503.91) < 0.05, s"easting $e")
    assert(math.abs(n - 254759.80) < 0.05, s"northing $n")
  }

  test("EPSG GN7-2 Mercator 1SP worked example (Makassar / NEIEZ, Bessel 1841)") {
    // published: E 5009726.58, N 569150.82 at 3S 120E
    val mak = Mercator1sp(a = 6377397.155, invF = 299.1528128, k0 = 0.997,
      lon0Deg = 110.0, falseEasting = 3900000.0, falseNorthing = 900000.0)
    val (e, n) = mak.forwardScalar(120.0, -3.0)
    assert(math.abs(e - 5009726.58) < 0.05, s"easting $e")
    assert(math.abs(n - 569150.82) < 0.05, s"northing $n")
    val (lonB, latB) = mak.inverseScalar(e, n)
    assert(math.abs(lonB - 120.0) < 1e-9 && math.abs(latB - (-3.0)) < 1e-9)
  }

  test("EPSG GN7-2 Pseudo-Mercator worked example and closed-form inverse") {
    // published: E -11169055.58, N 2800000.00 at 24d22'54.433N 100d20'W
    val wm = WebMercator()
    val lat = 24.0 + 22.0 / 60.0 + 54.433 / 3600.0
    val lon = -(100.0 + 20.0 / 60.0)
    val (x, y) = wm.forwardScalar(lon, lat)
    assert(math.abs(x - -11169055.58) < 0.05, s"x $x")
    assert(math.abs(y - 2800000.00) < 0.05, s"y $y")
    val (lonB, latB) = wm.inverseScalar(x, y)
    assert(math.abs(lonB - lon) < 1e-9 && math.abs(latB - lat) < 1e-9)
    // world-square invariant: lat ±85.051128.. maps to y = ±a*pi = ±x(180)
    val (x180, _) = wm.forwardScalar(180.0, 0.0)
    val (_, yTop) = wm.forwardScalar(0.0, 85.05112877980659)
    assert(math.abs(x180 - yTop) < 1e-6)
  }

  test("property: 200 random points round-trip sub-millimeter; column == scalar both ways") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genPt = for {
      lon <- Gen.choose(-120.0, -70.0)
      lat <- Gen.choose(25.0, 50.0) // LCC's comfort zone around the parallels
    } yield (lon, lat)
    val pts = (0 until 200).map(i => genPt.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    pts.foreach { case (lon, lat) =>
      val (x, y) = snyderLcc.forwardScalar(lon, lat)
      val (lonB, latB) = snyderLcc.inverseScalar(x, y)
      // 1e-8 deg ~ 1 mm
      assert(math.abs(lonB - lon) < 1e-8 && math.abs(latB - lat) < 1e-8,
        s"LCC round trip drift at ($lon, $lat): (${lonB - lon}, ${latB - lat})")
    }
    val df = pts.toDF("lon", "lat")
    val (xc, yc) = snyderLcc.forward(col("lon"), col("lat"))
    val proj = df.select(col("lon"), col("lat"), xc.as("x"), yc.as("y"))
    proj.collect().foreach { r =>
      val (sx, sy) = snyderLcc.forwardScalar(r.getDouble(0), r.getDouble(1))
      assert(r.getDouble(2) == sx && r.getDouble(3) == sy,
        s"column forward diverges from scalar at (${r.getDouble(0)}, ${r.getDouble(1)})")
    }
    val (lonC, latC) = snyderLcc.inverse(col("x"), col("y"))
    proj.select(col("x"), col("y"), lonC.as("lon"), latC.as("lat")).collect().foreach { r =>
      val (slon, slat) = snyderLcc.inverseScalar(r.getDouble(0), r.getDouble(1))
      assert(r.getDouble(2) == slon && r.getDouble(3) == slat,
        s"column inverse diverges from scalar at (${r.getDouble(0)}, ${r.getDouble(1)})")
    }
  }

  test("toPlanar/fromPlanar frame round trip stamps and restores the CRS") {
    val df = Seq((0L, 2.3522, 48.8566), (1L, 5.37, 43.30)).toDF("id", "lon", "lat")
    // Lambert-93-style grid (RGF93 params, spherical-sanity subset): the
    // shape of France's national CRS
    val l93 = Lcc2sp(a = 6378137.0, invF = 298.257222101,
      lat1Deg = 44.0, lat2Deg = 49.0, lat0Deg = 46.5, lon0Deg = 3.0,
      falseEasting = 700000.0, falseNorthing = 6600000.0, crs = "EPSG:2154")
    val proj = toPlanar(df, l93)
    assert(GeoFunctions.crsOf(proj) == "EPSG:2154" && GeoFunctions.isPlanar(proj))
    // Paris in Lambert-93 is ~(652k, 6.86M) — the published grid locality
    val paris = proj.orderBy("id").first()
    assert(math.abs(paris.getDouble(1) - 652000) < 5000, s"x ${paris.getDouble(1)}")
    assert(math.abs(paris.getDouble(2) - 6862000) < 5000, s"y ${paris.getDouble(2)}")
    val back = fromPlanar(proj, l93)
    assert(GeoFunctions.crsOf(back) == "EPSG:4326" && !GeoFunctions.isPlanar(back))
    back.orderBy("id").collect().zip(Seq((2.3522, 48.8566), (5.37, 43.30))).foreach {
      case (r, (lon, lat)) =>
        assert(math.abs(r.getDouble(1) - lon) < 1e-8 && math.abs(r.getDouble(2) - lat) < 1e-8)
    }
  }
}
