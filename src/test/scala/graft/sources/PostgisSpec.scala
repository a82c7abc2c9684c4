package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Executes Postgis.scala's JDBC plumbing against an embedded Derby
  * database (the one JDBC driver that ships on the Spark classpath) — no
  * PostGIS server exists in this environment, so geometry is exercised on
  * its WKT-as-text path and the validated surface is the Spark JDBC
  * option/cast plumbing plus round-trip fidelity of every codec the
  * PostGIS writers use: points, linestrings, the two-geometry locations
  * table (reference io/postgis.py:459-469) and the tours trips-as-JSON
  * column (io/postgis.py:722-733). A live-PostGIS run only swaps the URL
  * and driver in [[Postgis.Conn]]; the SQL surface is identical.
  */
class PostgisSpec extends SparkSpec {
  import spark.implicits._

  // keep derby.log out of the repo root
  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("graft_derby").toString)

  private val conn = Postgis.Conn(
    url = "jdbc:derby:memory:graftpg;create=true",
    user = "app", password = "app",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  test("positionfixes JDBC round trip (point WKT as text)") {
    val pfs = Seq(
      (0L, 1L, ts("2023-01-01 08:00:00"), 8.52940553, 47.39725036),
      (1L, 1L, ts("2023-01-01 08:05:00"), 8.51, 47.31),
      (2L, 2L, ts("2023-01-02 10:00:00"), -73.9857, 40.7484)
    ).toDF("id", "user_id", "tracked_at", "lon", "lat")
    Postgis.writePositionfixes(pfs, conn, table = "pg_pfs")
    val back = Postgis.readPositionfixes(spark, conn, table = "pg_pfs")
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getAs[Double]("lon") == 8.52940553)
    assert(back(0).getAs[Double]("lat") == 47.39725036)
    assert(back(2).getAs[Double]("lon") == -73.9857)
    assert(back(1).getAs[java.sql.Timestamp]("tracked_at") == ts("2023-01-01 08:05:00"))
  }

  test("staypoints JDBC round trip and append semantics") {
    val sp = Seq((0L, 1L, ts("2023-01-01 08:00:00"), ts("2023-01-01 09:00:00"), 8.5, 47.3))
      .toDF("id", "user_id", "started_at", "finished_at", "lon", "lat")
    Postgis.writeStaypoints(sp, conn, table = "pg_sp")
    Postgis.writeStaypoints(sp.withColumn("id", col("id") + 1), conn, table = "pg_sp",
      mode = SaveMode.Append)
    val back = Postgis.readStaypoints(spark, conn, table = "pg_sp")
    assert(back.count() == 2)
    assert(back.select("lon").distinct().as[Double].collect().toSeq == Seq(8.5))
  }

  test("triplegs JDBC round trip (LINESTRING WKT as text)") {
    val tpls = Seq((0L, 1L, ts("2023-01-01 08:00:00"), ts("2023-01-01 08:30:00"),
      Seq((8.5, 47.3), (8.51, 47.31), (8.52, 47.32))))
      .toDF("id", "user_id", "started_at", "finished_at", "points")
      .withColumn("points", transform(col("points"),
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))))
    Postgis.writeTriplegs(tpls, conn, table = "pg_tpls")
    val back = Postgis.readTriplegs(spark, conn, table = "pg_tpls").first()
    val pts = back.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("points")
    assert(pts.length == 3)
    assert(pts(1).getAs[Double]("lon") == 8.51 && pts(1).getAs[Double]("lat") == 47.31)
  }

  test("locations JDBC round trip: two geometry columns (center + extent)") {
    // reference io/postgis.py:459-469 writes the second geometry manually
    val ring = Seq((8.5, 47.3), (8.6, 47.3), (8.6, 47.4), (8.5, 47.3))
    val locs = Seq((0L, 1L, 8.55, 47.33, ring))
      .toDF("id", "user_id", "center_lon", "center_lat", "extent_hull")
      .withColumn("extent_hull", transform(col("extent_hull"),
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))))
    Postgis.writeLocations(locs, conn, table = "pg_locs")
    val back = Postgis.readLocations(spark, conn, table = "pg_locs").first()
    assert(back.getAs[Double]("center_lon") == 8.55)
    assert(back.getAs[Double]("center_lat") == 47.33)
    val hull = back.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("extent_hull")
    assert(hull.length == ring.length)
    assert(hull.head.getAs[Double]("lon") == 8.5 && hull.last.getAs[Double]("lat") == 47.3)
  }

  test("trips JDBC round trip with nullable o/d staypoints and MULTIPOINT geom") {
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
    Postgis.writeTrips(trips, conn, table = "pg_trips")
    val back = Postgis.readTrips(spark, conn, table = "pg_trips").orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getAs[Long]("origin_staypoint_id") == 10L)
    assert(back(1).isNullAt(back(1).fieldIndex("origin_staypoint_id")))
    val mp = back(1).getAs[org.apache.spark.sql.Row]("geom")
    val dest = mp.getAs[org.apache.spark.sql.Row]("destination")
    assert(dest.getAs[Double]("lon") == 8.7 && dest.getAs[Double]("lat") == 47.5)
  }

  // little-endian hex of an IEEE-754 double, as PostGIS prints it
  private def f64(d: Double): String = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => f"${(bits >> (8 * i)) & 0xFF}%02X").mkString
  }

  test("hex-EWKB codec: canonical point vector, all kinds round-trip bit-exactly") {
    import graft.functions.Wkb
    // the canonical PostGIS example: SELECT 'SRID=4326;POINT(1 2)'::geometry
    val pointHex = "0101000020E6100000000000000000F03F0000000000000040"
    val lineHex = "0102000020E610000002000000" + f64(1) + f64(2) + f64(3) + f64(4)
    val mpHex = "0104000020E610000002000000" +
      "0101000000" + f64(1) + f64(2) + "0101000000" + f64(3) + f64(4)
    val df = Seq(pointHex).toDF("g")
    val (lon, lat) = Wkb.parsePoint(col("g"))
    val p = df.select(lon.as("lon"), lat.as("lat"), Wkb.formatPoint(lon, lat).as("hex")).first()
    assert(p.getDouble(0) == 1.0 && p.getDouble(1) == 2.0)
    assert(p.getString(2) == pointHex, "format(parse(hex)) must reproduce the bytes exactly")

    val lineBack = Seq(lineHex).toDF("g")
      .select(Wkb.formatLine(Wkb.parseLine(col("g"))).as("hex")).first().getString(0)
    assert(lineBack == lineHex)
    val mpBack = Seq(mpHex).toDF("g")
      .select(Wkb.formatMultipoint(Wkb.parseMultipoint(col("g"))).as("hex")).first().getString(0)
    assert(mpBack == mpHex)

    val polyHex = "0103000020E61000000100000003000000" +
      f64(8.5) + f64(47.3) + f64(8.6) + f64(47.3) + f64(8.5) + f64(47.3)
    val polyBack = Seq(polyHex).toDF("g")
      .select(Wkb.formatPolygon(Wkb.parsePolygon(col("g"))).as("hex")).first().getString(0)
    assert(polyBack == polyHex)
    // truncated body (declares 4 points, carries 3) parses to null, not a crash
    val truncated = polyHex.replace("0100000003000000", "0100000004000000")
    val bad = Seq(truncated).toDF("g").select(Wkb.parsePolygon(col("g")).as("p")).first()
    assert(bad.isNullAt(0))
  }

  test("hex-WKB codec: big-endian, Z-ordinate, plain (no-SRID) and malformed inputs") {
    import graft.functions.Wkb
    def be64(d: Double): String = f"${java.lang.Double.doubleToLongBits(d)}%016X"
    val bePoint = "00" + "00000001" + be64(1.0) + be64(2.0)
    // PostGIS EWKB Z point: type = 1 | 0x80000000 | 0x20000000
    val zPoint = "01" + "010000A0" + "E6100000" + f64(1.0) + f64(2.0) + f64(5.0)
    val plain = "0101000000" + f64(1.0) + f64(2.0) // shapely wkb_hex form
    val rows = Seq(("be", bePoint), ("z", zPoint), ("plain", plain),
      ("wkt", "POINT (1.0 2.0)"), ("junk", "zz01"), ("short", "0101"))
    val (lon, lat) = Wkb.parsePoint(col("g"))
    val out = rows.toDF("k", "g").select(col("k"), lon.as("lon")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("be") == 1.0 && out("z") == 1.0 && out("plain") == 1.0)
    assert(out("wkt") == null && out("junk") == null && out("short") == null)
    // plain WKB is what srid = 0 formats
    val hex0 = Seq((1.0, 2.0)).toDF("lon", "lat")
      .select(Wkb.formatPoint(col("lon"), col("lat"), srid = 0)).first().getString(0)
    assert(hex0 == plain)
  }

  test("positionfixes JDBC round trip in EWKB form; mixed WKB/WKT rows read per-row") {
    val pfs = Seq((0L, 1L, ts("2023-01-01 08:00:00"), 8.52940553, 47.39725036))
      .toDF("id", "user_id", "tracked_at", "lon", "lat")
    Postgis.writePositionfixes(pfs, conn, table = "pg_pfs_wkb", geomFormat = "ewkb")
    // append a WKT-form row: a real deployment can hold text columns
    // migrated from both producers; the reader detects per row
    Postgis.writePositionfixes(pfs.withColumn("id", lit(1L)), conn, table = "pg_pfs_wkb",
      mode = SaveMode.Append, geomFormat = "wkt")
    val back = Postgis.readPositionfixes(spark, conn, table = "pg_pfs_wkb")
      .orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getAs[Double]("lon") == 8.52940553, "EWKB row decodes bit-exactly")
    assert(back(0).getAs[Double]("lat") == 47.39725036)
    assert(back(1).getAs[Double]("lon") == 8.52940553, "WKT row survives the same reader")
  }

  test("locations two-geometry row and triplegs/trips round-trip through EWKB") {
    val ring = Seq((8.5, 47.3), (8.6, 47.3), (8.6, 47.4), (8.5, 47.3))
    val locs = Seq((0L, 1L, 8.55, 47.33, ring))
      .toDF("id", "user_id", "center_lon", "center_lat", "extent_hull")
      .withColumn("extent_hull", transform(col("extent_hull"),
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))))
    Postgis.writeLocations(locs, conn, table = "pg_locs_wkb", geomFormat = "ewkb")
    val back = Postgis.readLocations(spark, conn, table = "pg_locs_wkb").first()
    assert(back.getAs[Double]("center_lon") == 8.55 && back.getAs[Double]("center_lat") == 47.33)
    val hull = back.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("extent_hull")
    assert(hull.map(r => (r.getDouble(0), r.getDouble(1))).toSeq == ring)

    val tpls = Seq((0L, 1L, ts("2023-01-01 08:00:00"), ts("2023-01-01 08:30:00"),
      Seq((8.5, 47.3), (8.51, 47.31))))
      .toDF("id", "user_id", "started_at", "finished_at", "points")
      .withColumn("points", transform(col("points"),
        p => struct(p.getField("_1").as("lon"), p.getField("_2").as("lat"))))
    Postgis.writeTriplegs(tpls, conn, table = "pg_tpls_wkb", geomFormat = "ewkb")
    val pts = Postgis.readTriplegs(spark, conn, table = "pg_tpls_wkb").first()
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("points")
    assert(pts.map(r => (r.getDouble(0), r.getDouble(1))).toSeq == Seq((8.5, 47.3), (8.51, 47.31)))

    val trips = Seq((0L, 1L, ts("2023-01-01 08:00:00"), ts("2023-01-01 09:00:00"),
      Some(10L), Some(11L), ((8.5, 47.3), (8.6, 47.4))))
      .toDF("id", "user_id", "started_at", "finished_at",
        "origin_staypoint_id", "destination_staypoint_id", "geom")
      .withColumn("geom", struct(
        struct(col("geom._1._1").as("lon"), col("geom._1._2").as("lat")).as("origin"),
        struct(col("geom._2._1").as("lon"), col("geom._2._2").as("lat")).as("destination")))
    Postgis.writeTrips(trips, conn, table = "pg_trips_wkb", geomFormat = "ewkb")
    val mp = Postgis.readTrips(spark, conn, table = "pg_trips_wkb").first()
      .getAs[org.apache.spark.sql.Row]("geom")
    assert(mp.getAs[org.apache.spark.sql.Row]("origin").getDouble(0) == 8.5)
    assert(mp.getAs[org.apache.spark.sql.Row]("destination").getDouble(1) == 47.4)
  }

  test("tours JDBC round trip: trips list column as JSON") {
    // reference io/postgis.py:722-733 serializes the trips list to JSON
    val tours = Seq(
      (0L, 1L, ts("2023-01-01 08:00:00"), ts("2023-01-01 18:00:00"), Seq(1L, 2L, 3L)),
      (1L, 2L, ts("2023-01-02 08:00:00"), ts("2023-01-02 18:00:00"), Seq.empty[Long])
    ).toDF("id", "user_id", "started_at", "finished_at", "trips")
    Postgis.writeTours(tours, conn, table = "pg_tours")
    val back = Postgis.readTours(spark, conn, table = "pg_tours").orderBy("id").collect()
    assert(back(0).getAs[scala.collection.Seq[Long]]("trips") == Seq(1L, 2L, 3L))
    assert(back(1).getAs[scala.collection.Seq[Long]]("trips").isEmpty)
  }
}
