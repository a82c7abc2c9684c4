package graft.sources

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC/PostGIS-style readers and writers for the domain tables
  * (reference: trackintel/io/postgis.py — SQLAlchemy/GeoAlchemy2 there,
  * `spark.read.format("jdbc")` here).
  *
  * Geometry travels as WKT text columns (parsed/formatted with the
  * [[Csv]] codec expressions); on the database side a PostGIS view or
  * trigger can cast via ST_GeomFromText — keeping the Spark side free of
  * database-specific binary encodings. The tours list column round-trips
  * as JSON like the reference (io/postgis.py:722-723).
  *
  * No PostGIS server exists in this environment; the JDBC plumbing and
  * every WKT/JSON codec round-trips against an embedded Derby database in
  * PostgisSpec (the driver Spark ships). A live-PostGIS run only swaps
  * the URL/driver in [[Conn]].
  */
object Postgis {

  final case class Conn(url: String, user: String, password: String,
                        driver: String = "org.postgresql.Driver")

  private def reader(spark: SparkSession, conn: Conn, table: String) =
    spark.read.format("jdbc")
      .option("url", conn.url).option("dbtable", table)
      .option("user", conn.user).option("password", conn.password)
      .option("driver", conn.driver)

  private def write(df: DataFrame, conn: Conn, table: String, mode: SaveMode): Unit =
    df.write.format("jdbc")
      .option("url", conn.url).option("dbtable", table)
      .option("user", conn.user).option("password", conn.password)
      .option("driver", conn.driver)
      .mode(mode).save()

  def readPositionfixes(spark: SparkSession, conn: Conn, table: String = "positionfixes"): DataFrame = {
    val df = reader(spark, conn, table).load()
    val (lon, lat) = Csv.parsePointWkt(col("geom"))
    Tables.positionfixes.validate(
      df.withColumn("lon", lon).withColumn("lat", lat).drop("geom"))
  }

  def writePositionfixes(pfs: DataFrame, conn: Conn, table: String = "positionfixes",
                         mode: SaveMode = SaveMode.Append): Unit =
    write(pfs.withColumn("geom", Csv.formatPointWkt(col("lon"), col("lat"))).drop("lon", "lat"),
      conn, table, mode)

  def readStaypoints(spark: SparkSession, conn: Conn, table: String = "staypoints"): DataFrame = {
    val df = reader(spark, conn, table).load()
    val (lon, lat) = Csv.parsePointWkt(col("geom"))
    Tables.staypoints.validate(
      df.withColumn("lon", lon).withColumn("lat", lat).drop("geom"))
  }

  def writeStaypoints(sp: DataFrame, conn: Conn, table: String = "staypoints",
                      mode: SaveMode = SaveMode.Append): Unit =
    write(sp.withColumn("geom", Csv.formatPointWkt(col("lon"), col("lat"))).drop("lon", "lat"),
      conn, table, mode)

  def readTriplegs(spark: SparkSession, conn: Conn, table: String = "triplegs"): DataFrame = {
    val df = reader(spark, conn, table).load()
    Tables.triplegs.validate(
      df.withColumn("points", Csv.parseLinestringWkt(col("geom"))).drop("geom"))
  }

  def writeTriplegs(tpls: DataFrame, conn: Conn, table: String = "triplegs",
                    mode: SaveMode = SaveMode.Append): Unit =
    write(tpls.withColumn("geom", Csv.formatLinestringWkt(col("points"))).drop("points"),
      conn, table, mode)

  /** locations: two geometry columns (center point + extent polygon),
    * like the reference's manual second-geometry handling
    * (io/postgis.py:459-469).
    */
  def writeLocations(locs: DataFrame, conn: Conn, table: String = "locations",
                     mode: SaveMode = SaveMode.Append): Unit = {
    val base = locs.withColumn("center", Csv.formatPointWkt(col("center_lon"), col("center_lat")))
      .drop("center_lon", "center_lat")
    val out = if (locs.columns.contains("extent_hull"))
      base.withColumn("extent", Csv.formatPolygonWkt(col("extent_hull"))).drop("extent_hull")
    else base
    write(out, conn, table, mode)
  }

  def writeTrips(trips: DataFrame, conn: Conn, table: String = "trips",
                 mode: SaveMode = SaveMode.Append): Unit = {
    val out = if (trips.columns.contains("geom"))
      trips.withColumn("geom", Csv.formatMultipointWkt(col("geom")))
    else trips
    write(out, conn, table, mode)
  }

  def readLocations(spark: SparkSession, conn: Conn, table: String = "locations"): DataFrame = {
    val df = reader(spark, conn, table).load()
    val (clon, clat) = Csv.parsePointWkt(col("center"))
    val base = df.withColumn("center_lon", clon).withColumn("center_lat", clat).drop("center")
    val out = if (df.columns.contains("extent"))
      base.withColumn("extent_hull", Csv.parsePolygonWkt(col("extent"))).drop("extent")
    else base
    Tables.locations.validate(out)
  }

  def readTrips(spark: SparkSession, conn: Conn, table: String = "trips"): DataFrame = {
    val df = reader(spark, conn, table).load()
    val out = if (df.columns.contains("geom"))
      df.withColumn("geom", Csv.parseMultipointWkt(col("geom")))
    else df
    Tables.trips.validate(out)
  }

  /** tours: `trips` list serialized as JSON (io/postgis.py:722-723). */
  def writeTours(tours: DataFrame, conn: Conn, table: String = "tours",
                 mode: SaveMode = SaveMode.Append): Unit =
    write(tours.withColumn("trips", to_json(col("trips"))), conn, table, mode)

  def readTours(spark: SparkSession, conn: Conn, table: String = "tours"): DataFrame = {
    val df = reader(spark, conn, table).load()
    Tables.tours.validate(df.withColumn("trips",
      from_json(col("trips"), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
  }
}
