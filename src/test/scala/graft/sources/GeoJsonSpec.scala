package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class GeoJsonSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = Files.createTempDirectory("graft_geojson").toString

  test("positionfixes ndgeojson round trip") {
    val pfs = Seq(
      (0L, 1L, ts("2023-01-01 08:00:00"), 8.5294, 47.3972),
      (1L, 2L, ts("2023-01-01 09:30:00"), -73.9857, 40.7484)
    ).toDF("id", "user_id", "tracked_at", "lon", "lat")
    val dir = s"${tmpDir()}/pfs"
    GeoJson.writePositionfixes(pfs, dir)
    val back = GeoJson.readPositionfixes(spark, dir).orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getAs[Double]("lon") == 8.5294 && back(0).getAs[Double]("lat") == 47.3972)
    assert(back(1).getAs[java.sql.Timestamp]("tracked_at") == ts("2023-01-01 09:30:00"))
  }

  test("positionfixes round trip preserves sub-second precision (micros)") {
    // sub-second GPS fixes must survive the GeoJSON path like they do on
    // CSV/parquet: writers format with .SSSSSS (full TimestampType precision)
    val t = java.sql.Timestamp.valueOf("2023-01-01 08:00:00.123456")
    val pfs = Seq((0L, 1L, t, 8.5, 47.4)).toDF("id", "user_id", "tracked_at", "lon", "lat")
    val dir = s"${tmpDir()}/pfs_subsec"
    GeoJson.writePositionfixes(pfs, dir)
    val back = GeoJson.readPositionfixes(spark, dir).collect()
    assert(back.head.getAs[java.sql.Timestamp]("tracked_at") == t)
  }

  test("FeatureCollection read: multiLine point features") {
    val dir = tmpDir()
    Files.writeString(Paths.get(dir, "sp.geojson"),
      """{
        |  "type": "FeatureCollection",
        |  "features": [
        |    {"type": "Feature",
        |     "geometry": {"type": "Point", "coordinates": [8.52, 47.39]},
        |     "properties": {"id": 0, "user_id": 1,
        |       "started_at": "2023-01-01T08:00:00Z", "finished_at": "2023-01-01T09:00:00Z"}},
        |    {"type": "Feature",
        |     "geometry": {"type": "Point", "coordinates": [8.55, 47.41]},
        |     "properties": {"id": 1, "user_id": 1,
        |       "started_at": "2023-01-01T10:00:00Z", "finished_at": "2023-01-01T11:15:00Z"}}
        |  ]
        |}""".stripMargin)
    val sp = GeoJson.readStaypoints(spark, s"$dir/sp.geojson", multiLine = true)
      .orderBy("id").collect()
    assert(sp.length == 2)
    assert(sp(0).getAs[Double]("lon") == 8.52)
    assert(sp(1).getAs[java.sql.Timestamp]("finished_at").toInstant ==
      java.time.Instant.parse("2023-01-01T11:15:00Z"))
  }

  test("triplegs LineString round trip preserves vertex order") {
    val tpls = Seq((0L, 1L, ts("2023-01-01 08:00:00"), ts("2023-01-01 08:30:00"),
      Seq((8.5, 47.3), (8.51, 47.31), (8.52, 47.32))))
      .toDF("id", "user_id", "started_at", "finished_at", "points")
      .withColumn("points", transform(col("points"),
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))))
    val dir = s"${tmpDir()}/tpls"
    GeoJson.writeTriplegs(tpls, dir)
    // the written line is valid RFC 7946 Feature JSON
    val raw = spark.read.text(dir).as[String].first()
    assert(raw.contains(""""type":"Feature"""") && raw.contains(""""LineString""""))
    val back = GeoJson.readTriplegs(spark, dir).first()
    val pts = back.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("points")
    assert(pts.map(r => (r.getDouble(0), r.getDouble(1))) ==
      Seq((8.5, 47.3), (8.51, 47.31), (8.52, 47.32)))
  }

  test("locations round trip: center geometry plus extent ring in properties") {
    val ring = Seq((8.5, 47.3), (8.6, 47.3), (8.6, 47.4), (8.5, 47.3))
    val locs = Seq((0L, 1L, 8.55, 47.33, ring))
      .toDF("id", "user_id", "center_lon", "center_lat", "extent_hull")
      .withColumn("extent_hull", transform(col("extent_hull"),
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))))
    val dir = s"${tmpDir()}/locs"
    GeoJson.writeLocations(locs, dir)
    val back = GeoJson.readLocations(spark, dir).first()
    assert(back.getAs[Double]("center_lon") == 8.55 && back.getAs[Double]("center_lat") == 47.33)
    val hull = back.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("extent_hull")
    assert(hull.map(r => (r.getDouble(0), r.getDouble(1))) == ring)
  }

  test("trips round trip: MULTIPOINT o/d geometry, nullable staypoint ids") {
    val trips = Seq(
      (0L, 1L, ts("2023-01-01 08:00:00"), ts("2023-01-01 09:00:00"),
        Some(10L), Some(11L), ((8.5, 47.3), (8.6, 47.4))),
      (1L, 1L, ts("2023-01-01 10:00:00"), ts("2023-01-01 11:00:00"),
        None, Some(12L), ((8.6, 47.4), (8.7, 47.5)))
    ).toDF("id", "user_id", "started_at", "finished_at",
        "origin_staypoint_id", "destination_staypoint_id", "geom")
      .withColumn("geom", struct(
        struct(col("geom._1._1").as("lon"), col("geom._1._2").as("lat")).as("origin"),
        struct(col("geom._2._1").as("lon"), col("geom._2._2").as("lat")).as("destination")))
    val dir = s"${tmpDir()}/trips"
    GeoJson.writeTrips(trips, dir)
    val back = GeoJson.readTrips(spark, dir).orderBy("id").collect()
    assert(back(0).getAs[Long]("origin_staypoint_id") == 10L)
    assert(back(1).isNullAt(back(1).fieldIndex("origin_staypoint_id")))
    val d = back(1).getAs[org.apache.spark.sql.Row]("geom").getAs[org.apache.spark.sql.Row]("destination")
    assert(d.getAs[Double]("lon") == 8.7 && d.getAs[Double]("lat") == 47.5)
  }

  test("tours round trip: null geometry, trips list in properties") {
    val tours = Seq(
      (0L, 1L, ts("2023-01-01 08:00:00"), ts("2023-01-01 18:00:00"), Seq(1L, 2L, 3L)))
      .toDF("id", "user_id", "started_at", "finished_at", "trips")
    val dir = s"${tmpDir()}/tours"
    GeoJson.writeTours(tours, dir)
    val raw = spark.read.text(dir).as[String].first()
    assert(!raw.contains(""""coordinates""""), "tours features carry null geometry")
    val back = GeoJson.readTours(spark, dir).first()
    assert(back.getAs[scala.collection.Seq[Long]]("trips") == Seq(1L, 2L, 3L))
    assert(back.getAs[java.sql.Timestamp]("finished_at") == ts("2023-01-01 18:00:00"))
  }

  test("staypoints ndgeojson round trip") {
    val sp = Seq((5L, 2L, ts("2023-02-01 07:00:00"), ts("2023-02-01 07:45:00"), 11.57, 48.14))
      .toDF("id", "user_id", "started_at", "finished_at", "lon", "lat")
    val dir = s"${tmpDir()}/sp"
    GeoJson.writeStaypoints(sp, dir)
    val back = GeoJson.readStaypoints(spark, dir).first()
    assert(back.getAs[Long]("user_id") == 2L)
    assert(back.getAs[Double]("lat") == 48.14)
    assert(back.getAs[java.sql.Timestamp]("started_at") == ts("2023-02-01 07:00:00"))
  }
}
