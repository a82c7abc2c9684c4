package graft.operators

import graft.functions.{GeoFunctions, TimeFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Activity flagging, transport-mode heuristics and speed enrichment.
  * Reference: trackintel/analysis/labelling.py, trackintel/geogr/distances.py.
  * All pure column expressions — codegen end to end.
  */
object Labelling {

  /** is_activity := duration > threshold (strictly), labelling.py:9-44. */
  def createActivityFlag(sp: DataFrame, timeThresholdMinutes: Double = 15.0,
                         activityColumnName: String = "is_activity"): DataFrame =
    sp.withColumn(activityColumnName,
      TimeFunctions.durationSeconds(col("started_at"), col("finished_at")) > timeThresholdMinutes * 60.0)

  /** 'simple-coarse' transport mode from average tripleg speed
    * (labelling.py:47-120): < 15 km/h slow, < 100 km/h motorized, else
    * fast mobility. Interval closed on the left like pd.cut(closed="left").
    */
  def predictTransportMode(tpls: DataFrame): DataFrame = {
    val withSpeed = getSpeedTriplegs(tpls)
    withSpeed.withColumn("mode",
      when(col("speed") < 15.0 / 3.6, "slow_mobility")
        .when(col("speed") < 100.0 / 3.6, "motorized_mobility")
        .otherwise("fast_mobility"))
  }

  /** Speed per positionfix in m/s from the previous fix; the first fix of
    * each user copies the second one's speed (geogr/distances.py:280-316).
    * A projected CRS (lon-column metadata, see GeoFunctions.isPlanar)
    * switches to euclidean distance — distances.py:299-303.
    */
  def getSpeedPositionfixes(pfs: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tracked_at", "id")
    val dist = GeoFunctions.distanceMeters(GeoFunctions.isPlanar(pfs))(
      lag(col("lon"), 1).over(w), lag(col("lat"), 1).over(w), col("lon"), col("lat"))
    val dt = (unix_micros(col("tracked_at")) - lag(unix_micros(col("tracked_at")), 1).over(w)) / lit(1e6)
    val speed = dist / dt
    pfs
      .withColumn("_speed0", speed)
      // first row per user: impute with the following row's speed
      .withColumn("speed", coalesce(col("_speed0"), lead(col("_speed0"), 1).over(w)))
      .drop("_speed0")
  }

  /** Tripleg speed = line length / duration (geogr/distances.py:319-357);
    * planar frames use euclidean segment lengths (distances.py:344).
    */
  def getSpeedTriplegs(tpls: DataFrame): DataFrame =
    tpls.withColumn("speed",
      GeoFunctions.linestringLengthMeters(col("points"), GeoFunctions.isPlanar(tpls, "points")) /
        TimeFunctions.durationSeconds(col("started_at"), col("finished_at")))

  /** pfs-mean variant: average the member positionfixes' speeds per
    * tripleg and join back (geogr/distances.py:359-370).
    */
  def getSpeedTriplegsPfsMean(tpls: DataFrame, pfsWithSpeed: DataFrame): DataFrame = {
    val perTpl = pfsWithSpeed
      .filter(col("tripleg_id").isNotNull)
      .groupBy(col("tripleg_id"))
      .agg(avg(col("speed")).as("speed"))
    tpls.join(perTpl, tpls("id") === perTpl("tripleg_id"), "left").drop("tripleg_id")
  }
}
