package graft.operators

import graft.model.Tables
import graft.util.Ids
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tripleg generation ("between_staypoints"): all positionfixes between two
  * staypoints form one tripleg, split further at temporal gaps.
  *
  * Reference: trackintel/preprocessing/positionfixes.py:200-458. The
  * reference builds boolean "new tripleg" flags with shift() and then does
  * an imperative arange/ffill id pass; here the whole operator is four
  * window expressions over `Window.partitionBy(user_id)` plus one
  * aggregation — no sequential scan, no driver loop, fully
  * whole-stage-codegen'd, and every shuffle is on `user_id` (or the
  * tripleg key), so it composes with the staypoint shuffle.
  *
  * Semantics reproduced exactly:
  *  - new tripleg starts at: first non-staypoint fix of a user; a fix
  *    following a temporal gap > gapThreshold; the first fix after a
  *    staypoint (staypoint-id transition);
  *  - fixes inside staypoints never belong to triplegs;
  *  - candidate triplegs with < 2 fixes are dropped (their fixes keep a
  *    null tripleg_id);
  *  - tripleg geometry is the time-ordered LineString of its fixes,
  *    started_at/finished_at are min/max tracked_at;
  *  - ids are dense int64 in (user, time) order.
  */
object TriplegGenerator {

  /** @param pfs positionfixes carrying a nullable `staypoint_id` column
    * @param share applied to the intermediates both outputs read (the
    *        flagged fix stream, the grouped candidates, the id-assigned
    *        tripleg table) — pass a persist so the window chain runs once
    *        across both outputs instead of once per output plus once for
    *        the id sort's range sampling.
    * @return (pfs with nullable `tripleg_id`, triplegs table)
    */
  def generate(pfs: DataFrame, gapThresholdMinutes: Double = 15.0,
               share: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {
    Tables.positionfixes.validate(pfs)
    require(pfs.columns.contains("staypoint_id"), "positionfixes need a staypoint_id column; run generateStaypoints first")

    val gapUs = (gapThresholdMinutes * 60e6).toLong
    val w = Window.partitionBy("user_id").orderBy("tracked_at", "id")

    val tUs = unix_micros(col("tracked_at"))
    // _stp_id = staypoint_id + 1 fillna 0, transition detected null-safely
    // (the reference's +1 trick, positionfixes.py:319-321).
    val stpKey = coalesce(col("staypoint_id") + 1, lit(0L))

    val flagged = share(pfs
      .withColumn("_t_us", tUs)
      .withColumn("_prev_t", lag("_t_us", 1).over(w))
      .withColumn("_prev_stp", lag(stpKey, 1).over(w))
      .withColumn("_cond_new_user", col("_prev_t").isNull)
      .withColumn("_cond_gap", col("_t_us") - col("_prev_t") > gapUs)
      .withColumn("_cond_stp", !(stpKey <=> col("_prev_stp")))
      .withColumn("_starts",
        (col("_cond_new_user") || col("_cond_gap") || col("_cond_stp")) && col("staypoint_id").isNull)
      .withColumn("_seg", sum(col("_starts").cast(LongType)).over(w)))

    // Candidate tripleg fixes; (user_id, _seg) is the tripleg key.
    val tplPfs = flagged.filter(col("staypoint_id").isNull && col("_seg") >= 1)

    // LineString needs >= 2 points (positionfixes.py:366-372).
    val segSize = Window.partitionBy("user_id", "_seg")
    val valid = tplPfs
      .withColumn("_n", count(lit(1)).over(segSize))
      .filter(col("_n") >= 2)

    val grouped = share(valid
      .groupBy(col("user_id"), col("_seg"))
      .agg(
        min(col("tracked_at")).as("started_at"),
        max(col("tracked_at")).as("finished_at"),
        transform(
          array_sort(collect_list(struct(col("_t_us"), col("id"), col("lon"), col("lat")))),
          p => struct(p.getField("lon").as("lon"), p.getField("lat").as("lat"))
        ).as("points")))

    val tpls = share(Ids.withSequentialId(grouped, "id", col("user_id"), col("started_at")))

    // Join tripleg ids back to the member fixes via the (user, seg) key.
    val mapping = tpls.select(col("user_id").as("_m_user"), col("_seg").as("_m_seg"), col("id").as("tripleg_id"))
    val pfsOut = flagged
      .join(mapping,
        col("user_id") === col("_m_user") && col("_seg") === col("_m_seg") && col("staypoint_id").isNull,
        "left")
      .drop("_m_user", "_m_seg", "_t_us", "_prev_t", "_prev_stp",
        "_cond_new_user", "_cond_gap", "_cond_stp", "_starts", "_seg")

    (pfsOut, tpls.select("id", "user_id", "started_at", "finished_at", "points"))
  }

  /** Tripleg generation with staypoint overlap ("overlap_staypoints",
    * positionfixes.py:417-477): same segments and ids as
    * between_staypoints, but triplegs share their boundary with the
    * neighboring staypoints —
    *  - time: a tripleg's `finished_at` extends to the first fix of the
    *    following staypoint (when no temporal gap separates them), so
    *    staypoints and triplegs tile time without holes;
    *  - geometry: the LineString gains the previous staypoint's centroid
    *    as its first point and the next staypoint's centroid as its last
    *    point. A single-fix staypoint is claimed entirely by the
    *    preceding tripleg, so the following tripleg does NOT spatially
    *    overlap it (reference Notes, positionfixes.py:437-440).
    *
    * Per-user independence: the reference computes its shift() masks over
    * the globally (user, time)-sorted frame, so at a user boundary the
    * previous user's trailing staypoint fix can observe the next user's
    * tripleg id (an artifact of the global shift, not documented
    * behavior). This engine partitions every window by `user_id` — users
    * are fully independent, which is both the intended semantics and the
    * only shape that scales.
    */
  def generateOverlap(pfs: DataFrame, sp: DataFrame,
                      gapThresholdMinutes: Double = 15.0,
                      share: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {
    val (pfsBetween, _) = generate(pfs, gapThresholdMinutes, share)
    overlapFromBetween(pfsBetween, sp, gapThresholdMinutes, share)
  }

  /** Overlap step over an already-computed between_staypoints result
    * (`pfsBetween` carries nullable `staypoint_id` and `tripleg_id`).
    * Split out so a pipeline that has the between output cached does not
    * recompute the segmentation.
    */
  def overlapFromBetween(pfsBetween: DataFrame, sp: DataFrame,
                         gapThresholdMinutes: Double = 15.0,
                         share: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {
    require(pfsBetween.columns.contains("staypoint_id") && pfsBetween.columns.contains("tripleg_id"),
      "overlap_staypoints needs the between_staypoints output (staypoint_id + tripleg_id columns)")
    val gapUs = (gapThresholdMinutes * 60e6).toLong
    val w = Window.partitionBy("user_id").orderBy("tracked_at", "id")

    // Overlap masks (positionfixes.py:443-463). `_start_id`: the first
    // fix of a staypoint extends the preceding tripleg (time + geometry)
    // when its predecessor is a tripleg fix and no gap separates them.
    // `_end_id`: the last fix of a staypoint joins the following
    // tripleg's geometry, unless `_start_id` already claimed it (the
    // single-fix-staypoint rule).
    val annotated = pfsBetween
      .withColumn("_t_us", unix_micros(col("tracked_at")))
      .withColumn("_prev_t", lag("_t_us", 1).over(w))
      .withColumn("_gap", coalesce(col("_t_us") - col("_prev_t") > gapUs, lit(false)))
      .withColumn("_next_gap", coalesce(lead(col("_gap"), 1).over(w), lit(false)))
      .withColumn("_start_id",
        when(col("_prev_t").isNotNull && col("staypoint_id").isNotNull && !col("_gap"),
          lag(col("tripleg_id"), 1).over(w)))
      .withColumn("_end_id",
        when(col("_prev_t").isNotNull && col("staypoint_id").isNotNull && !col("_next_gap")
          && col("_start_id").isNull,
          lead(col("tripleg_id"), 1).over(w)))
      // time spans use the start-overlap assignment only; geometry uses both
      .withColumn("_tid_time", coalesce(col("_start_id"), col("tripleg_id")))
      .withColumn("_tid_geom", coalesce(col("_start_id"), col("_end_id"), col("tripleg_id")))

    // Staypoint fixes contribute the staypoint centroid to tripleg
    // geometry (positionfixes.py:466-470). sp is tiny next to pfs at any
    // scale — AQE broadcasts this join.
    val spGeom = sp.select(col("id").as("_sp_id"), col("lon").as("_sp_lon"), col("lat").as("_sp_lat"))
    // withGeom feeds the time agg, the geometry agg, and the pfs output —
    // share it so the window chain + join run once across all three.
    val withGeom = share(annotated
      .join(spGeom, col("staypoint_id") === col("_sp_id"), "left")
      .withColumn("_glon", when(col("staypoint_id").isNotNull, col("_sp_lon")).otherwise(col("lon")))
      .withColumn("_glat", when(col("staypoint_id").isNotNull, col("_sp_lat")).otherwise(col("lat"))))

    val timeAgg = withGeom.filter(col("_tid_time").isNotNull)
      .groupBy(col("_tid_time").as("_tid"))
      .agg(min(col("user_id")).as("user_id"),
        min(col("tracked_at")).as("started_at"),
        max(col("tracked_at")).as("finished_at"))

    val geomAgg = withGeom.filter(col("_tid_geom").isNotNull)
      .groupBy(col("_tid_geom").as("_gid"))
      .agg(transform(
        array_sort(collect_list(struct(col("_t_us"), col("id"), col("_glon"), col("_glat")))),
        p => struct(p.getField("_glon").as("lon"), p.getField("_glat").as("lat"))).as("points"))

    val tpls = timeAgg.join(geomAgg, col("_tid") === col("_gid"))
      .select(col("_tid").as("id"), col("user_id"), col("started_at"), col("finished_at"), col("points"))

    val pfsOut = withGeom
      .withColumn("tripleg_id", col("_tid_geom"))
      .drop("_t_us", "_prev_t", "_gap", "_next_gap", "_start_id", "_end_id",
        "_tid_time", "_tid_geom", "_sp_id", "_sp_lon", "_sp_lat", "_glon", "_glat")

    (pfsOut, tpls)
  }
}
