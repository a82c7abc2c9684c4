package graft

import graft.model.Tables
import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{avg, col}

/** Accessor-style API — the Spark analogue of the reference's DataFrame
  * accessors (`pfs.generate_staypoints(...)`, model/util.py:103-118).
  * Import `graft.syntax._` and call domain methods directly on
  * DataFrames; every method validates its schema contract on entry and
  * returns plain DataFrames.
  *
  * {{{
  * import graft.syntax._
  * val (pfs2, sp)   = pfs.generateStaypoints()
  * val (pfs3, tpls) = pfs2.generateTriplegs()
  * val spAct        = sp.createActivityFlag()
  * val (spT, tplsT, trips) = spAct.generateTrips(tpls)
  * }}}
  */
object syntax {

  implicit final class RichPositionfixes(private val df: DataFrame) extends AnyVal {

    def asPositionfixes: DataFrame = Tables.positionfixes.validate(df)

    def generateStaypoints(params: StaypointGenerator.Params = StaypointGenerator.Params())
        : (DataFrame, DataFrame) =
      StaypointGenerator.generate(df, params)

    def generateTriplegs(gapThresholdMinutes: Double = 15.0): (DataFrame, DataFrame) =
      TriplegGenerator.generate(df, gapThresholdMinutes)

    def getSpeedPositionfixes: DataFrame = Labelling.getSpeedPositionfixes(df)

    /** Mean (lon, lat) of the table — the reference's `center` accessor
      * property (model/positionfixes.py:76-81); eager like the original.
      */
    def center: (Double, Double) = {
      val r = df.agg(avg(col("lon")), avg(col("lat"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
  }

  implicit final class RichStaypoints(private val df: DataFrame) extends AnyVal {

    def asStaypoints: DataFrame = Tables.staypoints.validate(df)

    def createActivityFlag(timeThresholdMinutes: Double = 15.0): DataFrame =
      Labelling.createActivityFlag(df, timeThresholdMinutes)

    def generateLocations(params: LocationGenerator.Params = LocationGenerator.Params())
        : (DataFrame, DataFrame) =
      LocationGenerator.generate(df, params)

    def generateTrips(tpls: DataFrame, gapThresholdMinutes: Double = 15.0)
        : (DataFrame, DataFrame, DataFrame) =
      TripGenerator.generate(df, tpls, gapThresholdMinutes)

    def mergeStaypoints(tpls: DataFrame, maxTimeGapMinutes: Double = 10.0,
                        aggExtra: Map[String, String] = Map.empty): DataFrame =
      StaypointMerger.mergeStaypoints(df, tpls, maxTimeGapMinutes, aggExtra)

    def radiusGyration(method: String = "count"): DataFrame = Metrics.radiusGyration(df, method)

    def jumpLength: DataFrame = Metrics.jumpLength(df)

    def temporalTrackingQuality(granularity: String = "all"): DataFrame =
      Metrics.temporalTrackingQuality(df, granularity)

    def locationIdentifier(method: String = "FREQ", preFilter: Boolean = true): DataFrame =
      LocationLabelling.locationIdentifier(df, method, preFilter)

    /** Mean (lon, lat) — `center` (model/staypoints.py:76-81). */
    def center: (Double, Double) = {
      val r = df.agg(avg(col("lon")), avg(col("lat"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
  }

  implicit final class RichTriplegs(private val df: DataFrame) extends AnyVal {

    def asTriplegs: DataFrame = Tables.triplegs.validate(df)

    def predictTransportMode: DataFrame = Labelling.predictTransportMode(df)

    def getSpeedTriplegs: DataFrame = Labelling.getSpeedTriplegs(df)

    def calculateModalSplit(metric: String = "count", freq: Option[String] = None,
                            perUser: Boolean = false, norm: Boolean = false): DataFrame =
      Metrics.calculateModalSplit(df, metric, freq, perUser, norm)
  }

  implicit final class RichTrips(private val df: DataFrame) extends AnyVal {

    def asTrips: DataFrame = Tables.trips.validate(df)

    def generateTours(staypoints: Option[DataFrame] = None,
                      params: TourGenerator.Params = TourGenerator.Params())
        : (DataFrame, DataFrame) =
      TourGenerator.generate(df, staypoints, params)
  }
}
