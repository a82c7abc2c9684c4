package graft.operators

import graft.model.Tables
import graft.util.Ids
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trip generation: aggregate staypoints + triplegs into trips — movement
  * between two activity staypoints, split at temporal gaps.
  *
  * Reference: trackintel/preprocessing/triplegs.py:12-230 (generate_trips).
  * The reference interleaves both tables, flags trip starts with shift(),
  * assigns ids with arange+ffill, then re-sorts a union with synthetic
  * "gap"/"user_change" filler rows to pick origin/destination via shift.
  * All of that maps onto per-user window functions here; the only
  * shuffles are on `user_id` and on the dense id joins.
  *
  * Semantics:
  *  - a new trip starts at a user change, after the last staypoint of an
  *    activity run, or after a recording gap (> gapThreshold between one
  *    record's finish and the next one's start);
  *  - non-activity staypoints and triplegs are trip members; trips with
  *    no tripleg are dropped;
  *  - origin/destination staypoint ids come from the neighboring activity
  *    staypoints; trips bordering a gap or the tracking edge keep nulls;
  *  - trip geometry is (origin point, destination point), falling back to
  *    the first/last coordinate of the first/last member tripleg when the
  *    corresponding activity staypoint is unknown.
  */
object TripGenerator {

  /** @param sp staypoints with `is_activity` (see Labelling.createActivityFlag)
    * @param tpls triplegs
    * @return (sp + [trip_id, prev_trip_id, next_trip_id], tpls + [trip_id], trips)
    */
  def generate(sp: DataFrame, tpls: DataFrame, gapThresholdMinutes: Double = 15.0,
               share: DataFrame => DataFrame = identity)
      : (DataFrame, DataFrame, DataFrame) = {
    Tables.staypoints.validate(sp)
    Tables.triplegs.validate(tpls)
    require(sp.columns.contains("is_activity"),
      "staypoints need the column 'is_activity' to be able to generate trips")

    val gapUs = (gapThresholdMinutes * 60e6).toLong

    // --- interleaved staypoint/tripleg stream (reference _concat_staypoints_triplegs)
    val spPart = sp.select(
      col("id").as("sp_tpls_id"), col("user_id"), col("started_at"), col("finished_at"),
      col("is_activity"), lit("staypoint").as("type"),
      struct(col("lon"), col("lat")).as("pt"),
      lit(null).cast(ArrayType(Tables.point)).as("points"))
    val tplPart = tpls.select(
      col("id").as("sp_tpls_id"), col("user_id"), col("started_at"), col("finished_at"),
      lit(false).as("is_activity"), lit("tripleg").as("type"),
      lit(null).cast(Tables.point).as("pt"),
      col("points"))
    val spTpls = spPart.unionByName(tplPart)

    // staypoints sort before triplegs on timestamp ties (concat order +
    // stable sort in the reference)
    val ord = when(col("type") === "staypoint", 0).otherwise(1)
    val w = Window.partitionBy("user_id").orderBy(col("started_at"), ord, col("sp_tpls_id"))

    val nextIsActivity = lead(col("is_activity"), 1, false).over(w)
    val prevFin = lag(unix_micros(col("finished_at")), 1).over(w)

    // flagged is read four ways (trip members, activity rows, gap rows,
    // user-change rows) — share it so the interleave + window chain runs
    // once across the union instead of once per branch.
    val flagged = share(spTpls
      .withColumn("_new_user", lag(col("sp_tpls_id"), 1).over(w).isNull)
      .withColumn("_last_activity", col("is_activity") && !nextIsActivity)
      // gap on this row: next record starts > threshold after this one finishes
      .withColumn("_gap_after",
        coalesce(lead(unix_micros(col("started_at")), 1).over(w) - unix_micros(col("finished_at")) > gapUs, lit(false)))
      .withColumn("_gap_before",
        coalesce(unix_micros(col("started_at")) - prevFin > gapUs, lit(false)))
      .withColumn("_new_trip", col("_new_user") || col("_last_activity") || col("_gap_before"))
      .withColumn("_temp_trip", sum(col("_new_trip").cast(LongType)).over(w)))

    // --- trip assembly over non-activity members
    val members = flagged.filter(!col("is_activity"))
    val grouped = members
      .groupBy(col("user_id"), col("_temp_trip"))
      .agg(
        min(col("started_at")).as("started_at"),
        max(col("finished_at")).as("finished_at"),
        array_sort(collect_list(struct(
          col("started_at").as("s"), col("type").as("t"), col("sp_tpls_id").as("i")))).as("_members"))
      .withColumn("_sp_ids", expr("transform(filter(_members, m -> m.t = 'staypoint'), m -> m.i)"))
      .withColumn("_tpl_ids", expr("transform(filter(_members, m -> m.t = 'tripleg'), m -> m.i)"))
      .filter(size(col("_tpl_ids")) > 0) // trips need >= 1 tripleg
      .drop("_members")

    val tripsNumbered = Ids.withSequentialId(share(grouped), "trip_id", col("user_id"), col("_temp_trip"))

    // --- union with activity staypoints + synthetic gap / user-change rows
    // (the reference's buffer rows that stop origin/destination ids from
    // leaking across gaps and users, triplegs.py:178-198)
    val tripRows = tripsNumbered.select(
      col("user_id"), col("started_at"), col("finished_at"),
      col("trip_id"), col("_sp_ids"), col("_tpl_ids"),
      lit(null).cast(LongType).as("sp_tpls_id"), lit(null).cast(Tables.point).as("pt"),
      lit("trip").as("type"))
    val actRows = flagged.filter(col("is_activity")).select(
      col("user_id"), col("started_at"), col("finished_at"),
      lit(null).cast(LongType).as("trip_id"),
      lit(null).cast(ArrayType(LongType)).as("_sp_ids"), lit(null).cast(ArrayType(LongType)).as("_tpl_ids"),
      col("sp_tpls_id"), col("pt"), lit("staypoint").as("type"))
    val gapRows = flagged.filter(col("_gap_after")).select(
      col("user_id"), timestamp_micros(unix_micros(col("finished_at")) + gapUs / 2).as("started_at"),
      lit(null).cast(TimestampType).as("finished_at"),
      lit(null).cast(LongType).as("trip_id"),
      lit(null).cast(ArrayType(LongType)).as("_sp_ids"), lit(null).cast(ArrayType(LongType)).as("_tpl_ids"),
      lit(null).cast(LongType).as("sp_tpls_id"), lit(null).cast(Tables.point).as("pt"),
      lit("gap").as("type"))
    val userChangeRows = flagged.filter(col("_new_user")).select(
      col("user_id"), timestamp_micros(unix_micros(col("started_at")) - gapUs / 2).as("started_at"),
      lit(null).cast(TimestampType).as("finished_at"),
      lit(null).cast(LongType).as("trip_id"),
      lit(null).cast(ArrayType(LongType)).as("_sp_ids"), lit(null).cast(ArrayType(LongType)).as("_tpl_ids"),
      lit(null).cast(LongType).as("sp_tpls_id"), lit(null).cast(Tables.point).as("pt"),
      lit("user_change").as("type"))

    val withAct = tripRows.unionByName(actRows).unionByName(gapRows).unionByName(userChangeRows)

    val ord2 = when(col("type") === "trip", 0).when(col("type") === "staypoint", 1)
      .when(col("type") === "gap", 2).otherwise(3)
    val w2 = Window.partitionBy("user_id").orderBy(col("started_at"), ord2, col("sp_tpls_id"))

    val shifted = share(withAct
      .withColumn("origin_staypoint_id", lag(col("sp_tpls_id"), 1).over(w2))
      .withColumn("destination_staypoint_id", lead(col("sp_tpls_id"), 1).over(w2))
      .withColumn("_origin_pt", lag(col("pt"), 1).over(w2))
      .withColumn("_dest_pt", lead(col("pt"), 1).over(w2))
      .withColumn("prev_trip_id", lag(col("trip_id"), 1).over(w2))
      .withColumn("next_trip_id", lead(col("trip_id"), 1).over(w2)))

    // --- trip geometry, with tripleg-endpoint fallback
    val tplEnds = tpls.select(
      col("id").as("_e_id"),
      element_at(col("points"), 1).as("_first_pt"),
      element_at(col("points"), -1).as("_last_pt"))

    val tripsShifted = shifted.filter(col("type") === "trip")
    // trips feeds the output and both membership explodes
    val trips = share(tripsShifted
      .join(tplEnds.as("fe"), element_at(col("_tpl_ids"), 1) === col("fe._e_id"), "left")
      .join(tplEnds.as("le"), element_at(col("_tpl_ids"), -1) === col("le._e_id"), "left")
      .select(
        col("trip_id").as("id"), col("user_id"), col("started_at"), col("finished_at"),
        col("origin_staypoint_id"), col("destination_staypoint_id"),
        struct(
          when(col("origin_staypoint_id").isNull, col("fe._first_pt")).otherwise(col("_origin_pt")).as("origin"),
          when(col("destination_staypoint_id").isNull, col("le._last_pt")).otherwise(col("_dest_pt")).as("destination")
        ).as("geom"),
        col("_sp_ids"), col("_tpl_ids")))

    // --- propagate ids back to the inputs
    val spMembership = trips.select(col("id").as("_trip_id"), explode(col("_sp_ids")).as("_m_id"))
    val actInfo = shifted.filter(col("type") === "staypoint")
      .select(col("sp_tpls_id").as("_a_id"), col("prev_trip_id"), col("next_trip_id"))
    val spOut = sp
      .join(spMembership, sp("id") === spMembership("_m_id"), "left")
      .withColumnRenamed("_trip_id", "trip_id")
      .drop("_m_id")
      .join(actInfo, sp("id") === actInfo("_a_id"), "left")
      .drop("_a_id")

    val tplMembership = trips.select(col("id").as("trip_id"), explode(col("_tpl_ids")).as("_m_id"))
    val tplsOut = tpls
      .join(tplMembership, tpls("id") === tplMembership("_m_id"), "left")
      .drop("_m_id")

    (spOut, tplsOut, trips.drop("_sp_ids", "_tpl_ids"))
  }
}
