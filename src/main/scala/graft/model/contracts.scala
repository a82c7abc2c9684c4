package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema contracts for the six domain tables of the movement-data model
  * (reference: the trackintel model package — each table class validates
  * required columns and a geometry type at construction; see SURVEY.md §1).
  *
  * Spark mapping: geometry Points are (lon, lat) double columns,
  * LineStrings are `array<struct<lon,lat>>`, timestamps are UTC
  * `TimestampType`, foreign keys nullable longs. Validation is eager at
  * operator entry — the analogue of the reference's constructor checks
  * (trackintel/model/positionfixes.py:41-47) — and fails fast at plan
  * time, before any job runs.
  */
final case class TableContract(name: String, required: Map[String, DataType]) {

  /** Throw if `df` is missing required columns or has mismatched types. */
  def validate(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = required.keys.filterNot(fields.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"$name is missing required column(s): ${missing.mkString(", ")}; has [${df.columns.mkString(", ")}]")
    val badTypes = required.collect {
      case (col, dt) if !compatible(fields(col), dt) => s"$col: expected $dt, got ${fields(col)}"
    }
    if (badTypes.nonEmpty)
      throw new IllegalArgumentException(s"$name has mismatched column type(s): ${badTypes.mkString("; ")}")
    df
  }

  // nullability never disqualifies: normalize everything to nullable
  private def norm(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f => f.copy(dataType = norm(f.dataType), nullable = true)))
    case a: ArrayType  => ArrayType(norm(a.elementType), containsNull = true)
    case m: MapType    => MapType(norm(m.keyType), norm(m.valueType), valueContainsNull = true)
    case other         => other
  }

  private def compatible(actual: DataType, expected: DataType): Boolean =
    (norm(actual), norm(expected)) match {
      case (a, e) if a == e              => true
      case (_: IntegerType, _: LongType) => true // narrower int FKs are fine
      case (_: FloatType, _: DoubleType) => true
      case (a: ArrayType, e: ArrayType)  => compatible(a.elementType, e.elementType)
      case _                             => false
    }
}

object Tables {
  val point: StructType =
    StructType(Seq(StructField("lon", DoubleType), StructField("lat", DoubleType)))

  /** positionfixes: reference trackintel/model/positionfixes.py:13 */
  val positionfixes = TableContract("positionfixes", Map(
    "user_id" -> LongType, "tracked_at" -> TimestampType,
    "lon" -> DoubleType, "lat" -> DoubleType))

  /** staypoints: reference trackintel/model/staypoints.py:12 */
  val staypoints = TableContract("staypoints", Map(
    "user_id" -> LongType, "started_at" -> TimestampType,
    "finished_at" -> TimestampType, "lon" -> DoubleType, "lat" -> DoubleType))

  /** triplegs: reference trackintel/model/triplegs.py:12 (LineString geom) */
  val triplegs = TableContract("triplegs", Map(
    "user_id" -> LongType, "started_at" -> TimestampType,
    "finished_at" -> TimestampType, "points" -> ArrayType(point)))

  /** locations: reference trackintel/model/locations.py:10 */
  val locations = TableContract("locations", Map(
    "user_id" -> LongType, "center_lon" -> DoubleType, "center_lat" -> DoubleType))

  /** trips: reference trackintel/model/trips.py:60 */
  val trips = TableContract("trips", Map(
    "user_id" -> LongType, "started_at" -> TimestampType, "finished_at" -> TimestampType,
    "origin_staypoint_id" -> LongType, "destination_staypoint_id" -> LongType))

  /** tours: reference trackintel/model/tours.py:12 */
  val tours = TableContract("tours", Map(
    "user_id" -> LongType, "started_at" -> TimestampType, "finished_at" -> TimestampType))
}
