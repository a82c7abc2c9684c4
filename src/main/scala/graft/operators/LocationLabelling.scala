package graft.operators

import graft.functions.TimeFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Home/work location identification (FREQ + OSNA) and the pre-filter.
  * Reference: trackintel/analysis/location_identification.py. Pure
  * grouped-aggregation + ranking-window code: shuffles only on user_id /
  * (user_id, location_id).
  */
object LocationLabelling {

  /** Boolean mask as a column joined onto sp: users with enough staypoints
    * and locations; locations with enough visits, duration, period
    * (location_identification.py:74-162). Returns sp + `keep` column.
    */
  def preFilterLocations(sp: DataFrame, aggLevel: String = "user",
                         threshSp: Int = 10, threshLoc: Int = 10, threshSpAtLoc: Int = 10,
                         threshLocTimeHours: Double = 1.0, threshLocPeriodHours: Double = 5.0): DataFrame = {
    require(aggLevel == "user" || aggLevel == "dataset", s"agg_level unknown: $aggLevel")
    val durUs = unix_micros(col("finished_at")) - unix_micros(col("started_at"))

    val userAgg = sp.groupBy("user_id").agg(
      (countDistinct(col("started_at")) >= threshSp &&
        countDistinct(col("location_id")) >= threshLoc).as("_user_ok"))

    val locKey = if (aggLevel == "user") Seq(col("user_id"), col("location_id")) else Seq(col("location_id"))
    val locAgg = sp
      .withColumn("_dur", durUs)
      .groupBy(locKey: _*)
      .agg(
        (count(col("started_at")) >= threshSpAtLoc).as("_n_ok"),
        (sum(col("_dur")) >= threshLocTimeHours * 3.6e9).as("_t_ok"),
        ((unix_micros(max(col("finished_at"))) - unix_micros(min(col("started_at")))).cast("double") >=
          threshLocPeriodHours * 3.6e9).as("_p_ok"))
      .withColumn("_loc_ok", col("_n_ok") && col("_t_ok") && col("_p_ok"))
      .drop("_n_ok", "_t_ok", "_p_ok")

    val keyNames = if (aggLevel == "user") Seq("user_id", "location_id") else Seq("location_id")
    sp
      .join(userAgg, Seq("user_id"), "left")
      .join(locAgg, keyNames, "left")
      .withColumn("keep", coalesce(col("_user_ok"), lit(false)) && coalesce(col("_loc_ok"), lit(false)))
      .drop("_user_ok", "_loc_ok")
  }

  /** FREQ method: rank locations by summed duration per user; top-1 gets
    * "home", top-2 "work" (location_identification.py:165-243).
    */
  /** Per-(user, location) dwell totals ranked per user — THE shared
    * ranking contract of the FREQ labeller and Metrics.commuteDistance:
    * integer-microsecond durations (exact, order-independent sums, so
    * the ranking is reproducible across runs and engines), rank by
    * (total desc, location_id). `extraAggs` ride the same groupBy so a
    * caller needing per-location aggregates (centroid sums) pays no
    * second pass.
    */
  def dwellRanking(sp: DataFrame, extraAggs: Seq[Column] = Nil): DataFrame = {
    val durUs = unix_micros(col("finished_at")) - unix_micros(col("started_at"))
    sp.filter(col("location_id").isNotNull)
      .withColumn("_dur", durUs)
      .groupBy(col("user_id"), col("location_id"))
      .agg(sum(col("_dur")).as("_total"), extraAggs: _*)
      .withColumn("_rank", row_number().over(
        Window.partitionBy("user_id").orderBy(col("_total").desc, col("location_id"))))
  }

  def freqMethod(sp: DataFrame, labels: Seq[String] = Seq("home", "work")): DataFrame = {
    val ranked = dwellRanking(sp)
    val labelled = ranked.withColumn("purpose",
      labels.zipWithIndex.foldLeft(lit(null).cast("string")) { case (acc, (l, i)) =>
        when(col("_rank") === i + 1, l).otherwise(acc)
      }).select(col("user_id"), col("location_id"), col("purpose"))

    sp.join(labelled, Seq("user_id", "location_id"), "left")
  }

  /** OSNA method (location_identification.py:246-344): weekday time frames
    * rest/work/leisure with paper weights; per-user argmax per frame gives
    * home (rest+leisure) and work; home wins conflicts and work falls back
    * to its second-best location.
    */
  def osnaMethod(sp: DataFrame): DataFrame =
    sp.join(osnaPurposes(sp), Seq("user_id", "location_id"), "left")

  /** The per-(user, location) purpose table behind [[osnaMethod]] —
    * exposed so aggregate consumers ([[homeAgreement]]) can read the
    * winners without fanning labels back onto every staypoint row.
    */
  private[operators] def osnaPurposes(sp: DataFrame): DataFrame = {
    val durUs = (unix_micros(col("finished_at")) - unix_micros(col("started_at")))
    val meanTime = timestamp_micros(unix_micros(col("started_at")) + (durUs / lit(2)).cast("long"))

    val frames = sp
      .filter(col("location_id").isNotNull)
      .withColumn("_label", TimeFunctions.osnaLabel(meanTime))
      .withColumn("_dur",
        when(col("_label") === "rest", durUs * 0.739)
          .when(col("_label") === "leisure", durUs * 0.358)
          .otherwise(durUs.cast("double")))
      .withColumn("_group",
        when(col("_label").isin("rest", "leisure"), "home")
          .when(col("_label") === "work", "work"))
      .filter(col("_group").isNotNull) // weekends excluded

    val agg = frames.groupBy("user_id", "location_id")
      .agg(
        sum(when(col("_group") === "home", col("_dur")).otherwise(lit(0.0))).as("_home"),
        sum(when(col("_group") === "work", col("_dur")).otherwise(lit(0.0))).as("_work"),
        max(when(col("_group") === "home", lit(1)).otherwise(lit(0))).as("_has_home"),
        max(when(col("_group") === "work", lit(1)).otherwise(lit(0))).as("_has_work"))

    val wU = Window.partitionBy("user_id")
    // idxmax semantics: fillna(0) then max; ties → first index order
    // (location_id ascending, the pivot's index order)
    val homeRank = row_number().over(wU.orderBy(col("_home").desc, col("location_id")))
    val workRank = row_number().over(wU.orderBy(col("_work").desc, col("location_id")))
    val ranked = agg
      .withColumn("_hr", homeRank)
      .withColumn("_wr", workRank)
      // only locations that actually have data in a frame can win it
      .withColumn("_is_home", col("_hr") === 1 && col("_has_home") === 1)
      .withColumn("_is_work_raw", col("_wr") === 1 && col("_has_work") === 1)

    // conflict: same location wins both → home wins; work goes to the
    // best work location that is not the home one
    val conflict = max(when(col("_is_home") && col("_is_work_raw"), 1).otherwise(0)).over(wU)
    val workRank2 = row_number().over(wU.orderBy(
      when(col("_is_home"), lit(-1.0)).otherwise(col("_work")).desc, col("location_id")))
    val resolved = ranked
      .withColumn("_conflict", conflict)
      .withColumn("_wr2", workRank2)
      .withColumn("_is_work",
        when(col("_conflict") === 1,
          !col("_is_home") && col("_wr2") === 1 && col("_has_work") === 1 && col("_work") > 0.0)
          .otherwise(col("_is_work_raw")))
      .withColumn("purpose",
        when(col("_is_home"), "home").when(col("_is_work"), "work"))
      .select(col("user_id"), col("location_id"), col("purpose"))

    resolved
  }

  /** Method-agreement card for home detection: the fraction of users
    * whose [[freqMethod]] home (most total dwell) and [[osnaMethod]]
    * home (rest/leisure-weighted timeframes) coincide — the standard
    * sanity check before trusting EITHER label downstream (commute
    * distance, home attachment, k-anonymity reasoning all key off
    * "home"). Disagreement concentrates on shift workers and sparse
    * users, so the rate is a data-quality signal, not just a method
    * comparison. Users lacking a home under either method (e.g. only
    * weekend observations for OSNA) are excluded from the denominator.
    *
    * Exact: both arms' winners are deterministic-tie-broken ranks; the
    * ppm rate is one integer cross-multiply. One groupBy per arm, one
    * user-keyed join. @return (n_users, n_agree, agree_ppm)
    */
  def homeAgreement(sp: DataFrame): DataFrame = {
    // read the winner tables directly (one row per user) instead of the
    // label-per-staypoint views — skips two sp-sized joins + distincts
    val fh = dwellRanking(sp).filter(col("_rank") === 1)
      .select(col("user_id"), col("location_id").as("_floc"))
    val oh = osnaPurposes(sp).filter(col("purpose") === "home")
      .select(col("user_id"), col("location_id").as("_oloc"))
    fh.join(oh, Seq("user_id"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(when(col("_floc") === col("_oloc"), 1L).otherwise(0L))
          .cast("long").as("n_agree"))
      .withColumn("agree_ppm",
        when(col("n_users") === 0L, 0L).otherwise(
          (lit(1000000L) * col("n_agree") -
            pmod(lit(1000000L) * col("n_agree"), col("n_users"))) / col("n_users"))
          .cast("long"))
  }

  /** Combined entry point like the reference's location_identifier. */
  def locationIdentifier(sp: DataFrame, method: String = "FREQ", preFilter: Boolean = true): DataFrame = {
    require(sp.columns.contains("location_id"), "staypoints must have a location_id column")
    val base = if (preFilter) {
      preFilterLocations(sp)
    } else sp.withColumn("keep", lit(true))
    val kept = base.filter(col("keep"))
    val labelled = method match {
      case "FREQ" => freqMethod(kept)
      case "OSNA" => osnaMethod(kept)
      case other  => throw new IllegalArgumentException(s"Method $other does not exist.")
    }
    val purposes = labelled.select(col("id").as("_lid"), col("purpose"))
    base.join(purposes, base("id") === col("_lid"), "left").drop("_lid", "keep")
  }
}
