package graft.sources

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adapter from the driver's synthetic test tables to the movement-data
  * model. The events table carries no coordinates, so positionfixes are
  * *derived deterministically* from (event_id, per-user fix index): each
  * user cycles through 4 "places" — 8 fixes dwelling at the place, then 4
  * fixes interpolating toward the next place (so staypoint *and* tripleg
  * structure exists at every scale factor), plus metre-scale jitter.
  *
  * The same arithmetic is expressed in [[pfsSql]] for the DuckDB oracle.
  * All intermediate math is integer or decimal (exact in both engines)
  * with a single final cast to double, so values are bit-identical across
  * engines.
  */
object EventsAdapter {

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    GraftSession.prepare(spark)
    // The driver has shipped events.ts under two layouts so far:
    // TIMESTAMP(NANOS) (read as long via nanosAsLong) and timestamp[us]
    // (read as TIMESTAMP or TIMESTAMP_NTZ depending on isAdjustedToUTC).
    // Dispatch on the schema actually found so a testdata regeneration
    // cannot silently break every events-derived query again; anything
    // unrecognized fails loudly naming the found type.
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tUs = raw.schema("ts").dataType match {
      case TimestampType    => unix_micros(col("ts"))
      // session timeZone is pinned to UTC (GraftSession), so NTZ->TZ cast
      // is the identity on the underlying micros — same as DuckDB epoch_us
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case LongType         => expr("ts div 1000") // nanos-as-long legacy
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; expected timestamp[(n)tz] or long(nanos)")
    }
    raw.withColumn("t_us", tUs)
  }

  // per-user fix index k, then: block = k div 12 (which stop in the tour
  // of 4 places), cyc = k % 12 (0-7 dwell, 8-11 move), f = interpolation
  // fraction, place longitudes p*0.01 / latitudes p*0.005 apart
  private val fExpr = "(case when k % 12 >= 8 then (k % 12 - 7) * 0.2 else 0 end)"
  private def lonExpr(idiv: String) =
    s"cast(-122.4 + ((k $idiv 12) % 4) * 0.01 * (1 - $fExpr) + (((k $idiv 12) + 1) % 4) * 0.01 * $fExpr" +
      s" + ((event_id * 7919) % 200) * 0.000001 as double)"
  private def latExpr(idiv: String) =
    s"cast(47.6 + ((k $idiv 12) % 4) * 0.005 * (1 - $fExpr) + (((k $idiv 12) + 1) % 4) * 0.005 * $fExpr" +
      s" + ((event_id * 104729) % 200) * 0.000001 as double)"

  // Per-(session, sfDir) memo of the derived positionfix frame: ~20 gate
  // queries start from this identical window-over-events chain, so its
  // first action localCheckpoints the result (plain row blocks — see
  // Pipeline's scaladoc for the tradeoff) and every later query starts
  // from the blocks instead of re-running the shuffle + projection.
  private val memo = scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  /** positionfixes: id, user_id, tracked_at, t_us, lon, lat, value. */
  def positionfixes(spark: SparkSession, sfDir: String): DataFrame = memo.synchronized {
    memo.getOrElseUpdate((spark, sfDir), {
      val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
      events(spark, sfDir)
        .withColumn("k", row_number().over(w).cast("long") - 1L)
        .select(
          col("event_id").as("id"),
          col("user_id"),
          timestamp_micros(col("t_us")).as("tracked_at"),
          col("t_us"),
          col("k"),
          expr(lonExpr("div")).as("lon"),
          expr(latExpr("div")).as("lat"),
          col("value"))
        .localCheckpoint(eager = false)
    })
  }

  /** Synthetic staypoint-shaped intervals: each event opens an interval of
    * `value` minutes. Used by interval-based operators (activity flag,
    * tracking quality, radius of gyration, location labelling).
    */
  def intervals(spark: SparkSession, sfDir: String): DataFrame =
    positionfixes(spark, sfDir).select(
      col("id"), col("user_id"),
      col("t_us").as("s_us"),
      (col("t_us") + expr("cast(floor(value * 60000000.0) as bigint)")).as("f_us"),
      col("k"), col("lon"), col("lat"))
      .withColumn("started_at", timestamp_micros(col("s_us")))
      .withColumn("finished_at", timestamp_micros(col("f_us")))

  /** DuckDB CTE prefix mirroring [[positionfixes]] / [[intervals]] —
    * prepend to every oracle query that uses the derived tables.
    */
  val pfsSql: String =
    s"""WITH ev_k AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS t_us, value,
       |         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) - 1 AS k
       |  FROM events
       |), pfs AS (
       |  SELECT event_id AS id, user_id, t_us, value, k,
       |         ${lonExpr("//").replace("cast(", "CAST(").replace(" as double)", " AS DOUBLE)")} AS lon,
       |         ${latExpr("//").replace("cast(", "CAST(").replace(" as double)", " AS DOUBLE)")} AS lat
       |  FROM ev_k
       |), intervals AS (
       |  SELECT id, user_id, t_us AS s_us,
       |         t_us + CAST(floor(value * 60000000.0) AS BIGINT) AS f_us, k, lon, lat
       |  FROM pfs
       |)""".stripMargin

  /** Haversine in DuckDB SQL, mirroring GeoFunctions.haversineMeters
    * expression shape exactly (same operation order).
    */
  def havSql(lon1: String, lat1: String, lon2: String, lat2: String): String =
    s"6371000.0 * acos(least(1.0, greatest(-1.0, " +
      s"cos(radians($lat1) - radians($lat2)) - cos(radians($lat1)) * cos(radians($lat2)) * " +
      s"(1.0 - cos(radians($lon1) - radians($lon2))))))"
}
