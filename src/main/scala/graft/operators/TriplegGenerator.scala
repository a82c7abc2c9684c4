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
    * @return (pfs with nullable `tripleg_id`, triplegs table)
    */
  def generate(pfs: DataFrame, gapThresholdMinutes: Double = 15.0): (DataFrame, DataFrame) = {
    Tables.positionfixes.validate(pfs)
    require(pfs.columns.contains("staypoint_id"), "positionfixes need a staypoint_id column; run generateStaypoints first")

    val gapUs = (gapThresholdMinutes * 60e6).toLong
    val w = Window.partitionBy("user_id").orderBy("tracked_at", "id")

    val tUs = unix_micros(col("tracked_at"))
    // _stp_id = staypoint_id + 1 fillna 0, transition detected null-safely
    // (the reference's +1 trick, positionfixes.py:319-321).
    val stpKey = coalesce(col("staypoint_id") + 1, lit(0L))

    val flagged = pfs
      .withColumn("_t_us", tUs)
      .withColumn("_prev_t", lag("_t_us", 1).over(w))
      .withColumn("_prev_stp", lag(stpKey, 1).over(w))
      .withColumn("_cond_new_user", col("_prev_t").isNull)
      .withColumn("_cond_gap", col("_t_us") - col("_prev_t") > gapUs)
      .withColumn("_cond_stp", !(stpKey <=> col("_prev_stp")))
      .withColumn("_starts",
        (col("_cond_new_user") || col("_cond_gap") || col("_cond_stp")) && col("staypoint_id").isNull)
      .withColumn("_seg", sum(col("_starts").cast(LongType)).over(w))

    // Candidate tripleg fixes; (user_id, _seg) is the tripleg key.
    val tplPfs = flagged.filter(col("staypoint_id").isNull && col("_seg") >= 1)

    // LineString needs >= 2 points (positionfixes.py:366-372).
    val segSize = Window.partitionBy("user_id", "_seg")
    val valid = tplPfs
      .withColumn("_n", count(lit(1)).over(segSize))
      .filter(col("_n") >= 2)

    val grouped = valid
      .groupBy(col("user_id"), col("_seg"))
      .agg(
        min(col("tracked_at")).as("started_at"),
        max(col("tracked_at")).as("finished_at"),
        transform(
          array_sort(collect_list(struct(col("_t_us"), col("id"), col("lon"), col("lat")))),
          p => struct(p.getField("lon").as("lon"), p.getField("lat").as("lat"))
        ).as("points"))

    val tpls = Ids.withSequentialId(grouped, "id", col("user_id"), col("started_at"))

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
}
