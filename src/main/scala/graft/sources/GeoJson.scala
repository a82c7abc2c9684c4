package graft.sources

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON (RFC 7946) readers/writers for the domain tables — the file
  * format behind the reference's `read_*_gpd` path when frames come from
  * .geojson files (geopandas.read_file; trackintel/io/from_geopandas.py
  * accepts whatever GeoDataFrame that yields).
  *
  * Two layouts:
  *  - **newline-delimited GeoJSON** (one Feature per line, a.k.a.
  *    ndgeojson) — the scale path: Spark's JSON source splits it like any
  *    text file, so reads parallelize per block and writes stream from
  *    executors. This is what [[writePositionfixes]] et al. produce.
  *  - **FeatureCollection** (one JSON object spanning the whole file) —
  *    read via `multiLine` + an `inline(features)` explode. Convenience
  *    for small hand-authored files; a 100 TB corpus should be ndgeojson
  *    or parquet.
  *
  * Geometry parsing/formatting is schema-driven (`from_json`/`to_json`
  * with exact coordinate arity per geometry type) — scan-stage column
  * expressions, no UDF.
  */
object GeoJson {

  // ---------------- schemas ----------------

  private def geometrySchema(coordinates: DataType) = StructType(Seq(
    StructField("type", StringType), StructField("coordinates", coordinates)))

  private val pointCoords = ArrayType(DoubleType)
  private val lineCoords = ArrayType(ArrayType(DoubleType))

  private def featureSchema(coordinates: DataType, properties: StructType) = StructType(Seq(
    StructField("type", StringType),
    StructField("geometry", geometrySchema(coordinates)),
    StructField("properties", properties)))

  private def collectionSchema(coordinates: DataType, properties: StructType) = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(featureSchema(coordinates, properties)))))

  private val pfsProps = StructType(Seq(
    StructField("id", LongType), StructField("user_id", LongType),
    StructField("tracked_at", StringType)))

  private val spProps = StructType(Seq(
    StructField("id", LongType), StructField("user_id", LongType),
    StructField("started_at", StringType), StructField("finished_at", StringType)))

  // locations: center is THE geometry (a Feature has one); the extent ring
  // travels in properties, mirroring the reference's one-geometry file IO
  // with extent as an auxiliary column
  private val locProps = StructType(Seq(
    StructField("id", LongType), StructField("user_id", LongType),
    StructField("extent", ArrayType(ArrayType(DoubleType)))))

  private val tripProps = StructType(Seq(
    StructField("id", LongType), StructField("user_id", LongType),
    StructField("started_at", StringType), StructField("finished_at", StringType),
    StructField("origin_staypoint_id", LongType),
    StructField("destination_staypoint_id", LongType)))

  private val tourProps = StructType(Seq(
    StructField("id", LongType), StructField("user_id", LongType),
    StructField("started_at", StringType), StructField("finished_at", StringType),
    StructField("trips", ArrayType(LongType))))

  // ---------------- generic feature readers ----------------

  /** Features of one geometry arity from ndgeojson (default) or a
    * FeatureCollection (`multiLine = true`), as (geometry, properties).
    */
  private def readFeatures(spark: SparkSession, path: String, coordinates: DataType,
                           properties: StructType, multiLine: Boolean): DataFrame =
    if (multiLine)
      spark.read.option("multiLine", "true")
        .schema(collectionSchema(coordinates, properties)).json(path)
        .select(inline(col("features")))
        .select(col("geometry"), col("properties"))
    else
      spark.read.schema(featureSchema(coordinates, properties)).json(path)
        .select(col("geometry"), col("properties"))

  private def prop(name: String): Column = col("properties").getField(name)

  // ---------------- per-table readers ----------------

  def readPositionfixes(spark: SparkSession, path: String,
                        multiLine: Boolean = false): DataFrame = {
    val f = readFeatures(spark, path, pointCoords, pfsProps, multiLine)
    Tables.positionfixes.validate(f.select(
      prop("id").as("id"), prop("user_id").as("user_id"),
      to_timestamp(prop("tracked_at")).as("tracked_at"),
      element_at(col("geometry.coordinates"), 1).as("lon"),
      element_at(col("geometry.coordinates"), 2).as("lat")))
  }

  def readStaypoints(spark: SparkSession, path: String,
                     multiLine: Boolean = false): DataFrame = {
    val f = readFeatures(spark, path, pointCoords, spProps, multiLine)
    Tables.staypoints.validate(f.select(
      prop("id").as("id"), prop("user_id").as("user_id"),
      to_timestamp(prop("started_at")).as("started_at"),
      to_timestamp(prop("finished_at")).as("finished_at"),
      element_at(col("geometry.coordinates"), 1).as("lon"),
      element_at(col("geometry.coordinates"), 2).as("lat")))
  }

  def readTriplegs(spark: SparkSession, path: String,
                   multiLine: Boolean = false): DataFrame = {
    val f = readFeatures(spark, path, lineCoords, spProps, multiLine)
    Tables.triplegs.validate(f.select(
      prop("id").as("id"), prop("user_id").as("user_id"),
      to_timestamp(prop("started_at")).as("started_at"),
      to_timestamp(prop("finished_at")).as("finished_at"),
      transform(col("geometry.coordinates"),
        c => struct(element_at(c, 1).as("lon"), element_at(c, 2).as("lat"))).as("points")))
  }

  def readLocations(spark: SparkSession, path: String,
                    multiLine: Boolean = false): DataFrame = {
    val f = readFeatures(spark, path, pointCoords, locProps, multiLine)
    val base = f.select(
      prop("id").as("id"), prop("user_id").as("user_id"),
      element_at(col("geometry.coordinates"), 1).as("center_lon"),
      element_at(col("geometry.coordinates"), 2).as("center_lat"),
      transform(prop("extent"),
        c => struct(element_at(c, 1).as("lon"), element_at(c, 2).as("lat"))).as("extent_hull"))
    Tables.locations.validate(base)
  }

  /** Trips: MULTIPOINT (origin, destination) geometry; o/d staypoint ids
    * in properties (nullable — gap-adjacent trips have no staypoint).
    */
  def readTrips(spark: SparkSession, path: String,
                multiLine: Boolean = false): DataFrame = {
    val f = readFeatures(spark, path, lineCoords, tripProps, multiLine)
    Tables.trips.validate(f.select(
      prop("id").as("id"), prop("user_id").as("user_id"),
      to_timestamp(prop("started_at")).as("started_at"),
      to_timestamp(prop("finished_at")).as("finished_at"),
      prop("origin_staypoint_id").as("origin_staypoint_id"),
      prop("destination_staypoint_id").as("destination_staypoint_id"),
      struct(
        struct(element_at(element_at(col("geometry.coordinates"), 1), 1).as("lon"),
          element_at(element_at(col("geometry.coordinates"), 1), 2).as("lat")).as("origin"),
        struct(element_at(element_at(col("geometry.coordinates"), 2), 1).as("lon"),
          element_at(element_at(col("geometry.coordinates"), 2), 2).as("lat")).as("destination"))
        .as("geom")))
  }

  /** Tours carry no geometry (RFC 7946 allows a null-geometry Feature);
    * the trips list rides in properties.
    */
  def readTours(spark: SparkSession, path: String,
                multiLine: Boolean = false): DataFrame = {
    val f = readFeatures(spark, path, pointCoords, tourProps, multiLine)
    Tables.tours.validate(f.select(
      prop("id").as("id"), prop("user_id").as("user_id"),
      to_timestamp(prop("started_at")).as("started_at"),
      to_timestamp(prop("finished_at")).as("finished_at"),
      prop("trips").as("trips")))
  }

  // ---------------- per-table writers (ndgeojson) ----------------

  private def pointGeometry(lon: Column, lat: Column): Column =
    struct(lit("Point").as("type"), array(lon, lat).as("coordinates"))

  def writePositionfixes(pfs: DataFrame, path: String): Unit =
    pfs.select(to_json(struct(
        lit("Feature").as("type"),
        pointGeometry(col("lon"), col("lat")).as("geometry"),
        struct(col("id"), col("user_id"),
          date_format(col("tracked_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("tracked_at"))
          .as("properties"))).as("value"))
      .write.mode("overwrite").text(path)

  def writeStaypoints(sp: DataFrame, path: String): Unit =
    sp.select(to_json(struct(
        lit("Feature").as("type"),
        pointGeometry(col("lon"), col("lat")).as("geometry"),
        struct(col("id"), col("user_id"),
          date_format(col("started_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("started_at"),
          date_format(col("finished_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("finished_at"))
          .as("properties"))).as("value"))
      .write.mode("overwrite").text(path)

  def writeTriplegs(tpls: DataFrame, path: String): Unit =
    tpls.select(to_json(struct(
        lit("Feature").as("type"),
        struct(lit("LineString").as("type"),
          transform(col("points"), p => array(p.getField("lon"), p.getField("lat")))
            .as("coordinates")).as("geometry"),
        struct(col("id"), col("user_id"),
          date_format(col("started_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("started_at"),
          date_format(col("finished_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("finished_at"))
          .as("properties"))).as("value"))
      .write.mode("overwrite").text(path)

  def writeLocations(locs: DataFrame, path: String): Unit = {
    val extent = if (locs.columns.contains("extent_hull"))
      transform(col("extent_hull"), p => array(p.getField("lon"), p.getField("lat")))
    else lit(null).cast(ArrayType(ArrayType(DoubleType)))
    locs.select(to_json(struct(
        lit("Feature").as("type"),
        pointGeometry(col("center_lon"), col("center_lat")).as("geometry"),
        struct(col("id"), col("user_id"), extent.as("extent")).as("properties"))).as("value"))
      .write.mode("overwrite").text(path)
  }

  def writeTrips(trips: DataFrame, path: String): Unit =
    trips.select(to_json(struct(
        lit("Feature").as("type"),
        struct(lit("MultiPoint").as("type"),
          array(array(col("geom.origin.lon"), col("geom.origin.lat")),
            array(col("geom.destination.lon"), col("geom.destination.lat")))
            .as("coordinates")).as("geometry"),
        struct(col("id"), col("user_id"),
          date_format(col("started_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("started_at"),
          date_format(col("finished_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("finished_at"),
          col("origin_staypoint_id"), col("destination_staypoint_id"))
          .as("properties"))).as("value"))
      .write.mode("overwrite").text(path)

  def writeTours(tours: DataFrame, path: String): Unit =
    tours.select(to_json(struct(
        lit("Feature").as("type"),
        lit(null).cast(geometrySchema(pointCoords)).as("geometry"),
        struct(col("id"), col("user_id"),
          date_format(col("started_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("started_at"),
          date_format(col("finished_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as("finished_at"),
          col("trips")).as("properties"))).as("value"))
      .write.mode("overwrite").text(path)
}
