package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("EPSG Guidance Note 7-2 worked example: OSGB36 British National Grid") {
    // Transverse Mercator, Airy 1830 ellipsoid; published test vector:
    // phi = 50d30'00"N, lambda = 0d30'00"E -> E 577274.99, N 69740.50
    val osgb = Projection.TmParams(a = 6377563.396, invF = 299.3249646,
      k0 = 0.9996012717, lon0Deg = -2.0, lat0Deg = 49.0,
      falseEasting = 400000.0, falseNorthing = -100000.0)
    val (e, n) = Projection.tmForward(0.5, 50.5, osgb)
    assert(math.abs(e - 577274.99) < 0.02, s"easting $e")
    assert(math.abs(n - 69740.50) < 0.02, s"northing $n")
  }

  test("column form matches the scalar twin exactly") {
    val pts = Seq((8.5417, 47.3769), (9.0, 0.0), (6.01, 45.2), (11.99, 83.5), (9.0, -0.5))
    val df = pts.toDF("lon", "lat")
    val (e, n) = Projection.tmForward(col("lon"), col("lat"), Projection.utm(32))
    val got = df.select(col("lon"), col("lat"), e.as("e"), n.as("n")).collect()
    got.foreach { r =>
      val (se, sn) = Projection.tmForward(r.getDouble(0), r.getDouble(1), Projection.utm(32))
      assert(r.getDouble(2) == se && r.getDouble(3) == sn,
        s"(${r.getDouble(0)}, ${r.getDouble(1)}): column (${r.getDouble(2)}, ${r.getDouble(3)}) vs scalar ($se, $sn)")
    }
  }

  test("UTM invariants: central meridian, equator origin, southern false northing") {
    // on the central meridian of zone 32 (9E) easting is exactly FE
    val (e0, n0) = Projection.tmForward(9.0, 0.0, Projection.utm(32))
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    // northing along the central meridian = k0 * meridian arc (47N ~ 5.2Mm)
    val (_, n47) = Projection.tmForward(9.0, 47.0, Projection.utm(32))
    assert(n47 > 5100000 && n47 < 5300000)
    // south variant shifts northing by exactly the 10Mm false northing
    val (_, nS) = Projection.tmForward(9.0, -10.0, Projection.utm(32, south = true))
    val (_, nN) = Projection.tmForward(9.0, -10.0, Projection.utm(32))
    assert(math.abs((nS - nN) - 10000000.0) < 1e-6)
    assert(Projection.utmZoneOf(8.54) == 32 && Projection.utmZoneOf(-73.99) == 18)
    assert(Projection.utmEpsg(32) == "EPSG:32632" && Projection.utmEpsg(19, south = true) == "EPSG:32719")
  }

  test("toUtm: euclidean on projected meters matches haversine within scale distortion") {
    // two points ~1.1 km apart in Zurich (zone 32, ~0.5 deg from the
    // central meridian, where UTM scale error is ~4e-4)
    val df = Seq((0L, 8.5417, 47.3769), (1L, 8.5500, 47.3850)).toDF("id", "lon", "lat")
    val proj = Projection.toUtm(df, zone = 32)
    val row = proj.orderBy("id").collect()
    val (x0, y0) = (row(0).getDouble(1), row(0).getDouble(2))
    val (x1, y1) = (row(1).getDouble(1), row(1).getDouble(2))
    val planar = GeoFunctions.euclideanMeters(x0, y0, x1, y1)
    val sphere = GeoFunctions.haversineMeters(8.5417, 47.3769, 8.5500, 47.3850)
    // spherical-vs-ellipsoidal earth + k0 distortion: agree within 0.3%
    assert(math.abs(planar - sphere) / sphere < 0.003, s"planar $planar vs haversine $sphere")
    assert(planar > 900 && planar < 1500)
  }

  test("forward -> inverse round trip closes to sub-millimeter across the zone") {
    val p = Projection.utm(32)
    val pts = Seq((8.5417, 47.3769), (9.0, 0.0001), (6.01, 45.2), (11.99, 70.0),
      (9.5, -33.7), (7.2, 12.0))
    pts.foreach { case (lon, lat) =>
      val (e, n) = Projection.tmForward(lon, lat, p)
      val (lonBack, latBack) = Projection.tmInverse(e, n, p)
      // 1e-8 deg ~ 1 mm
      assert(math.abs(lonBack - lon) < 1e-8 && math.abs(latBack - lat) < 1e-8,
        s"($lon, $lat) -> ($e, $n) -> ($lonBack, $latBack)")
    }
  }

  test("property: 200 random in-zone points round-trip sub-millimeter; column == scalar") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val p = Projection.utm(32)
    val genPt = for {
      lon <- Gen.choose(6.0, 12.0)     // zone 32
      lat <- Gen.choose(-80.0, 84.0)   // UTM latitude band
    } yield (lon, lat)
    val pts = (0 until 200).map(i => genPt.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    pts.foreach { case (lon, lat) =>
      val (e, n) = Projection.tmForward(lon, lat, p)
      val (lonBack, latBack) = Projection.tmInverse(e, n, p)
      assert(math.abs(lonBack - lon) < 1e-8 && math.abs(latBack - lat) < 1e-8,
        s"round trip drift at ($lon, $lat): (${lonBack - lon}, ${latBack - lat})")
    }
    val df = pts.toDF("lon", "lat")
    val (ec, nc) = Projection.tmForward(col("lon"), col("lat"), p)
    df.select(col("lon"), col("lat"), ec.as("e"), nc.as("n")).collect().foreach { r =>
      val (se, sn) = Projection.tmForward(r.getDouble(0), r.getDouble(1), p)
      assert(r.getDouble(2) == se && r.getDouble(3) == sn)
    }
    // the INVERSE as a column over the same 200 projected points:
    // bit-identical to the scalar inverse (same ops, same order)
    val projDf = df.select(ec.as("e"), nc.as("n"))
    val (lonC, latC) = Projection.tmInverse(col("e"), col("n"), p)
    projDf.select(col("e"), col("n"), lonC.as("lon"), latC.as("lat")).collect().foreach { r =>
      val (slon, slat) = Projection.tmInverse(r.getDouble(0), r.getDouble(1), p)
      assert(r.getDouble(2) == slon && r.getDouble(3) == slat,
        s"column inverse (${r.getDouble(2)}, ${r.getDouble(3)}) vs scalar ($slon, $slat)")
    }
  }

  test("fromUtm closes the toUtm frame round trip and restores the geographic CRS") {
    val df = Seq((0L, 8.5417, 47.3769), (1L, 6.2, -33.7), (2L, 11.9, 70.0))
      .toDF("id", "lon", "lat")
    val back = Projection.fromUtm(Projection.toUtm(df, zone = 32), zone = 32)
    assert(GeoFunctions.crsOf(back) == "EPSG:4326" && !GeoFunctions.isPlanar(back))
    back.orderBy("id").collect().zip(Seq((8.5417, 47.3769), (6.2, -33.7), (11.9, 70.0))).foreach {
      case (r, (lon, lat)) =>
        assert(math.abs(r.getDouble(1) - lon) < 1e-8 && math.abs(r.getDouble(2) - lat) < 1e-8)
    }
  }

  test("planar dispatch: a toUtm frame is planar and downstream math goes euclidean") {
    val df = Seq((8.5417, 47.3769)).toDF("lon", "lat")
    assert(!GeoFunctions.isPlanar(df)) // default EPSG:4326
    val proj = Projection.toUtm(df, zone = 32)
    assert(GeoFunctions.crsOf(proj) == "EPSG:32632")
    assert(GeoFunctions.isPlanar(proj))
  }
}
