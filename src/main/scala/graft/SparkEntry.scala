package graft

import graft.operators._
import graft.sources.EventsAdapter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — queries over the driver's parquet tables plus the
  * DuckDB oracle SQL for each (see Verify). Column names and value
  * arithmetic are kept bit-compatible between both sides: integer
  * div/mod where possible, decimal sums for money, floor-quantized
  * meters for trig-derived values.
  */
object SparkEntry {

  private val hav = EventsAdapter.havSql _

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- relational core over the TPC-H-ish tables ------------------
    "q1_agg" -> { (s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("count_order"),
          sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(20,2)")).cast("double").as("sum_base_price"),
          sum(col("l_quantity").cast("decimal(20,2)") * col("l_discount").cast("decimal(20,2)"))
            .cast("double").as("sum_disc_qty"))
    },
    "q3_join" -> { (s, dir) =>
      val customer = s.read.parquet(s"$dir/customer.parquet")
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val lineitem = s.read.parquet(s"$dir/lineitem.parquet")
      customer
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(20,2)") * (lit(1.0) - col("l_discount")).cast("decimal(20,2)"))
            .cast("double").as("revenue"))
    },
    "q_topn_orders" -> { (s, dir) =>
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("o_orderpriority"), col("rn").cast("long").as("rn"), col("o_orderkey"))
    },

    // ----- mobility: projections / dedup ------------------------------
    "pf_dedup" -> { (s, dir) =>
      EventsAdapter.positionfixes(s, dir)
        .dropDuplicates("user_id", "t_us", "lon", "lat")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_pfs"))
    },

    // ----- mobility: window-based scalar ops --------------------------
    "speed_positionfixes" -> { (s, dir) =>
      val pfs = EventsAdapter.positionfixes(s, dir).drop("value")
      Labelling.getSpeedPositionfixes(pfs)
        .select(col("id"), col("user_id"),
          floor(col("speed") * 1000.0).cast("long").as("speed_mms"))
    },
    "jump_length" -> { (s, dir) =>
      Metrics.jumpLength(EventsAdapter.intervals(s, dir))
        .select(col("id"), col("user_id"), floor(col("jump_length")).cast("long").as("jump_m"))
    },
    "sessionize_events" -> { (s, dir) =>
      EventOps.sessionize(EventsAdapter.events(s, dir), gapMinutes = 30.0, tsCol = "t_us")
        .select(col("event_id"), col("user_id"), col("session_id"))
    },

    // ----- mobility: labelling / aggregation --------------------------
    "activity_flag" -> { (s, dir) =>
      Labelling.createActivityFlag(EventsAdapter.intervals(s, dir), timeThresholdMinutes = 15.0)
        .select(col("id"), col("user_id"), col("is_activity"))
    },
    "tracking_quality_all" -> { (s, dir) =>
      Metrics.temporalTrackingQuality(EventsAdapter.intervals(s, dir), "all")
        .select(col("user_id"), col("quality"))
    },
    "tracking_quality_day" -> { (s, dir) =>
      Metrics.temporalTrackingQuality(EventsAdapter.intervals(s, dir), "day")
        .select(col("user_id"), unix_micros(col("day")).as("day_us"), col("quality"))
    },
    "radius_gyration" -> { (s, dir) =>
      Metrics.radiusGyration(EventsAdapter.intervals(s, dir), "count")
        .select(col("user_id"), floor(col("radius_gyration")).cast("long").as("rg_m"))
    },

    // ----- mobility: sequential detectors (no SQL equivalent → rows-only) ----
    "staypoints_sliding" -> { (s, dir) =>
      Pipeline.staypoints(s, dir)
        .select(col("id"), col("user_id"), col("started_at"), col("finished_at"), col("lon"), col("lat"))
    },
    "triplegs_generate" -> { (s, dir) =>
      import graft.functions.GeoFunctions
      Pipeline.triplegs(s, dir)
        .select(col("id"), col("user_id"), col("started_at"), col("finished_at"),
          size(col("points")).as("n_points"),
          floor(GeoFunctions.linestringLengthMeters(col("points"))).cast("long").as("length_m"))
    },
    "trips_generate" -> { (s, dir) =>
      Pipeline.trips(s, dir)
        .select(col("id"), col("user_id"), col("started_at"), col("finished_at"),
          col("origin_staypoint_id"), col("destination_staypoint_id"))
    },
    "locations_dbscan" -> { (s, dir) =>
      Pipeline.locations(s, dir)
        .select(col("id"), col("user_id"), col("center_lon"), col("center_lat"))
    },
    "tours_generate" -> { (s, dir) =>
      Pipeline.tours(s, dir)
        .select(col("id"), col("user_id"), col("started_at"), col("finished_at"), size(col("trips")).as("n_trips"))
    }
  )

  /** DuckDB-equivalent SQL per query (same column names; see Verify). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS count_order,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2)) * CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE) AS sum_disc_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT c_mktsegment,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * CAST(1.0 - l_discount AS DECIMAL(20,2))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_topn_orders" ->
      """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rn, o_orderkey FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 5""".stripMargin,
    "pf_dedup" ->
      s"""${EventsAdapter.pfsSql}, d AS (
         |  SELECT DISTINCT user_id, t_us, lon, lat FROM pfs)
         |SELECT user_id, count(*) AS n_pfs FROM d GROUP BY user_id""".stripMargin,
    "speed_positionfixes" ->
      s"""${EventsAdapter.pfsSql}, lagged AS (
         |  SELECT id, user_id, t_us, lon, lat,
         |         lag(t_us) OVER w AS pt, lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
         |  FROM pfs WINDOW w AS (PARTITION BY user_id ORDER BY t_us, id)
         |), sp AS (
         |  SELECT id, user_id, t_us,
         |         ${hav("plon", "plat", "lon", "lat")} / ((t_us - pt) / 1000000.0) AS speed0
         |  FROM lagged
         |)
         |SELECT id, user_id,
         |  CAST(floor(coalesce(speed0, lead(speed0) OVER (PARTITION BY user_id ORDER BY t_us, id)) * 1000.0) AS BIGINT) AS speed_mms
         |FROM sp""".stripMargin,
    "jump_length" ->
      s"""${EventsAdapter.pfsSql}, nxt AS (
         |  SELECT id, user_id, lon, lat,
         |         lead(lon) OVER w AS nlon, lead(lat) OVER w AS nlat
         |  FROM intervals WINDOW w AS (PARTITION BY user_id ORDER BY s_us, id))
         |SELECT id, user_id,
         |  CASE WHEN nlon IS NULL THEN NULL
         |       ELSE CAST(floor(${hav("lon", "lat", "nlon", "nlat")}) AS BIGINT) END AS jump_m
         |FROM nxt""".stripMargin,
    "sessionize_events" ->
      """WITH t AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS t_us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS pt
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(CASE WHEN pt IS NULL OR t_us - pt > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
        |FROM t""".stripMargin,
    "activity_flag" ->
      s"""${EventsAdapter.pfsSql}
         |SELECT id, user_id, (f_us - s_us) / 1000000.0 > 900.0 AS is_activity FROM intervals""".stripMargin,
    "tracking_quality_all" ->
      s"""${EventsAdapter.pfsSql}
         |SELECT user_id,
         |  CAST(sum(f_us - s_us) AS DOUBLE) / CAST(max(f_us) - min(s_us) AS DOUBLE) AS quality
         |FROM intervals WHERE f_us - s_us > 0 GROUP BY user_id""".stripMargin,
    "tracking_quality_day" ->
      s"""${EventsAdapter.pfsSql}, cuts AS (
         |  SELECT user_id, s_us, f_us,
         |         greatest(s_us, d * 86400000000) AS cs,
         |         least(f_us, (d + 1) * 86400000000) AS cf,
         |         d * 86400000000 AS day_us
         |  FROM intervals, LATERAL (SELECT unnest(range(s_us // 86400000000, f_us // 86400000000 + 1)) AS d)
         |  WHERE f_us - s_us > 0 AND least(f_us, (d + 1) * 86400000000) > greatest(s_us, d * 86400000000)
         |)
         |SELECT user_id, day_us, CAST(sum(cf - cs) AS DOUBLE) / 86400000000.0 AS quality
         |FROM cuts GROUP BY user_id, day_us""".stripMargin,
    "radius_gyration" ->
      s"""${EventsAdapter.pfsSql}, cent AS (
         |  SELECT user_id, sum(lon * 1.0) / sum(1.0) AS cx, sum(lat * 1.0) / sum(1.0) AS cy
         |  FROM intervals GROUP BY user_id)
         |SELECT i.user_id,
         |  CAST(floor(sqrt(sum(pow(${hav("i.lon", "i.lat", "c.cx", "c.cy")}, 2) * 1.0) / sum(1.0))) AS BIGINT) AS rg_m
         |FROM intervals i JOIN cent c ON i.user_id = c.user_id
         |GROUP BY i.user_id""".stripMargin
  )
}
