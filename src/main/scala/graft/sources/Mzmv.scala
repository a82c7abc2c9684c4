package graft.sources

import graft.util.Ids
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the Swiss "Mikrozensus Mobilität und Verkehr" (MZMV) travel
  * survey, the semantics of the reference's `read_mzmv`
  * (trackintel/io/dataset_reader.py:369-455, staypoint synthesis 546-686,
  * verification-point LineStrings 458-521, time parsing 523-543).
  *
  * Input is a directory containing the survey CSVs (`wege.csv` = trips,
  * `etappen.csv` = triplegs, `verifikationspunkte.csv`,
  * `zielpersonen.csv`), read as plain distributed CSV scans. Differences
  * from the reference, by design:
  *
  *  - the routed tripleg geometry ships as a shapefile; pass its path as
  *    `routesPath` to decode it with the pure-JVM [[Shapefile]] reader
  *    and join it on as `geometry`. The verification-point LineStrings
  *    (`vp_xy`) are always built — the reference itself documents them
  *    as the always-available geometry;
  *  - entity ids are dense longs in deterministic (user, sequence-number)
  *    order rather than CSV row order (equal whenever the export is
  *    user-sorted, which the survey files are);
  *  - a verification point enters a LineString when its own (x, y) pair
  *    is present (the reference keeps a point if *any* of the four
  *    wgs/ch1903 coordinates is present, producing NaN vertices).
  *
  * All shift()-style logic runs as per-user windows: the reference shifts
  * over the globally sorted frame, but every cross-user leak it creates
  * is immediately overwritten via its `ETNR == 1` masks, so per-user
  * windows (which shuffle once on user_id and scale) are equivalent.
  */
object Mzmv {

  /** Staypoint attribute columns copied from the tripleg start (S_*) /
    * end (Z_*) location blocks when present (dataset_reader.py:605-630).
    */
  val locationAttrCols: Seq[String] = Seq(
    "X", "Y", "QAL", "BFS", "PLZ", "Ort", "Str", "hnr", "LND", "X_CH1903", "Y_CH1903",
    "SPRACHE", "REGION", "KANTON", "NUTS3", "AGGLO2000", "AGGLO_GROESSE2000",
    "STRUKTUR_2000", "STRUKTUR_AGG_2000", "struktur_bfs9_2000", "AGGLO2012",
    "AGGLO_GROESSE2012", "staedt_char_2012", "stat_stadt_2012", "DEGURBA")

  final case class Out(trips: DataFrame, staypoints: DataFrame, triplegs: DataFrame)

  /** All columns read as strings — schema inference would eagerly parse
    * time-like strings (and fail on the survey's "24:00:00"); numeric
    * columns are cast explicitly where their semantics need it.
    */
  private def readCsv(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", "ISO-8859-1")
      .csv(s"$dir/$name")

  private def castCols(df: DataFrame, casts: (String, DataType)*): DataFrame =
    casts.foldLeft(df) { case (d, (name, t)) =>
      if (d.columns.contains(name)) d.withColumn(name, col(name).cast(t)) else d
    }

  /** "HH:mm:ss" survey times on the fixed date 1970-01-01; "24:00:00" is
    * clamped to 23:59:59 (dataset_reader.py:523-543).
    */
  private def mzmvTime(c: Column): Column =
    to_timestamp(
      concat(lit("1970-01-01 "), when(c === "24:00:00", "23:59:59").otherwise(c)),
      "yyyy-MM-dd HH:mm:ss")

  /** Overnight records end before they start; push the finish to the next
    * day (dataset_reader.py:420-429).
    */
  private def fixNegativeDuration(df: DataFrame): DataFrame =
    df.withColumn("finished_at",
      when(col("finished_at") < col("started_at"), col("finished_at") + expr("INTERVAL 1 DAY"))
        .otherwise(col("finished_at")))

  /** @param routesPath optional routed-geometry shapefile (`.shp` or the
    *        zip MZMV ships, `CH_routen.zip`): decoded with [[Shapefile]]
    *        and left-joined onto triplegs by (HHNR, ETNR) as a `geometry`
    *        linestring column — the reference's gpd.read_file merge
    *        (dataset_reader.py:395, 434-437). Absent → verification-point
    *        geometry only, which the reference documents as the
    *        always-available fallback.
    */
  def read(spark: SparkSession, dir: String, routesPath: Option[String] = None): Out = {
    val rename = Seq("HHNR" -> "user_id", "f51100time" -> "started_at", "f51400time" -> "finished_at")
    def renamed(df: DataFrame): DataFrame = castCols(
      rename.foldLeft(df) { case (d, (from, to)) => if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d },
      "user_id" -> LongType, "WEGNR" -> LongType, "ETNR" -> LongType,
      "S_X" -> DoubleType, "S_Y" -> DoubleType, "S_X_CH1903" -> DoubleType, "S_Y_CH1903" -> DoubleType,
      "Z_X" -> DoubleType, "Z_Y" -> DoubleType, "Z_X_CH1903" -> DoubleType, "Z_Y_CH1903" -> DoubleType,
      "W_X_CH1903" -> DoubleType, "W_Y_CH1903" -> DoubleType)

    // --- trips (wege.csv) -------------------------------------------------
    val trips0 = fixNegativeDuration(
      renamed(readCsv(spark, dir, "wege.csv"))
        .withColumn("started_at", mzmvTime(col("started_at")))
        .withColumn("finished_at", mzmvTime(col("finished_at"))))
    val trips1 = Ids.withSequentialId(trips0, "trip_id", col("user_id"), col("WEGNR"))

    // --- triplegs (etappen.csv) + trip id ---------------------------------
    val tpls0 = fixNegativeDuration(
      renamed(readCsv(spark, dir, "etappen.csv"))
        .withColumn("started_at", mzmvTime(col("started_at")))
        .withColumn("finished_at", mzmvTime(col("finished_at"))))
      .join(trips1.select(col("user_id"), col("WEGNR"), col("trip_id")), Seq("user_id", "WEGNR"))
    val tpls1 = Ids.withSequentialId(tpls0, "tripleg_id", col("user_id"), col("ETNR"))

    // --- staypoints synthesized from tripleg boundaries -------------------
    val sp = generateStaypoints(spark, dir, tpls1)

    // --- verification-point LineStrings -----------------------------------
    val vp = verificationLinestrings(spark, dir, tpls1)
    val tplsVp = tpls1.join(vp, Seq("user_id", "ETNR"), "left")

    // --- routed geometry from the shapefile (when provided) ---------------
    val tpls = routesPath.fold(tplsVp) { shp =>
      val routes = Shapefile.read(spark, shp)
        .select(col("HHNR").as("user_id"), col("ETNR"),
          col("points").as("geometry"))
      tplsVp.join(routes, Seq("user_id", "ETNR"), "left")
    }

    // --- trip origin/destination staypoints (dataset_reader.py:449-453) ---
    val dest = sp.filter(col("prev_trip_id").isNotNull)
      .select(col("prev_trip_id").as("_pt"), col("staypoint_id").as("destination_staypoint_id"))
    val orig = sp.filter(col("next_trip_id").isNotNull)
      .select(col("next_trip_id").as("_nt"), col("staypoint_id").as("origin_staypoint_id"))
    val trips = trips1
      .join(dest, col("trip_id") === col("_pt"))
      .join(orig, col("trip_id") === col("_nt"))
      .drop("_pt", "_nt")

    Out(trips, sp, tpls)
  }

  /** One staypoint per tripleg start + one per user's final tripleg end
    * (dataset_reader.py:546-686). All shifts are per-user in ETNR order.
    */
  private def generateStaypoints(spark: SparkSession, dir: String, tpls: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ETNR")
    val attrs = locationAttrCols

    val hasPurpose = tpls.columns.contains("f52900")
    val purposeCol = if (hasPurpose) col("f52900") else lit(null).cast(StringType)

    val flagged = tpls
      .withColumn("_first", lag(col("ETNR"), 1).over(w).isNull)
      .withColumn("_last", lead(col("ETNR"), 1).over(w).isNull)
      // new-trip boundary: previous row has a different (user, WEGNR)
      .withColumn("_s_is_activity", !(col("WEGNR") <=> lag(col("WEGNR"), 1).over(w)))
      .withColumn("_prev_trip", lag(col("trip_id"), 1).over(w))
      .withColumn("_prev_fin", lag(col("finished_at"), 1).over(w))
      .withColumn("_prev_purpose", lag(purposeCol, 1).over(w))

    def attrSelect(prefix: String): Seq[Column] =
      attrs.filter(a => flagged.columns.contains(s"$prefix$a")).map(a => col(s"$prefix$a").as(a))

    // start-of-tripleg staypoints
    val sStay = flagged.select(Seq(
      col("user_id"), col("WEGNR"), col("ETNR"), lit(0).as("_block"),
      when(col("W_X_CH1903").isNotNull, col("W_X_CH1903")).otherwise(lit(null)).as("W_X_CH1903"),
      when(col("W_Y_CH1903").isNotNull, col("W_Y_CH1903")).otherwise(lit(null)).as("W_Y_CH1903"),
      col("_s_is_activity").as("is_activity"),
      when(col("_first"), col("started_at")).otherwise(col("_prev_fin")).as("started_at"),
      col("started_at").as("finished_at"),
      when(col("_s_is_activity") && !col("_first"), col("_prev_trip")).otherwise(lit(null)).as("prev_trip_id"),
      when(col("_s_is_activity"), col("trip_id")).otherwise(lit(null)).as("next_trip_id"),
      when(!col("_s_is_activity"), col("trip_id")).otherwise(lit(null)).as("trip_id"),
      when(col("_first"), lit(null)).otherwise(col("_prev_purpose")).as("purpose_tpls")) ++
      attrSelect("S_"): _*)

    // end-of-tracking staypoint per user (from the last tripleg's Z_ block)
    val zStay = flagged.filter(col("_last")).select(Seq(
      col("user_id"), col("WEGNR"), col("ETNR"), lit(1).as("_block"),
      col("W_X_CH1903"), col("W_Y_CH1903"),
      lit(true).as("is_activity"),
      col("finished_at").as("started_at"),
      lit(null).cast(TimestampType).as("finished_at"),
      col("trip_id").as("prev_trip_id"),
      lit(null).cast(LongType).as("next_trip_id"),
      lit(null).cast(LongType).as("trip_id"),
      purposeCol.as("purpose_tpls")) ++
      attrSelect("Z_"): _*)

    val stacked = sStay.unionByName(zStay, allowMissingColumns = true)

    // purpose: compare against the person's home / work / education coords
    val zp0 = readCsv(spark, dir, "zielpersonen.csv")
    val zp = zp0.select(
      col("HHNR").cast(LongType).as("user_id"),
      col("A_X_CH1903").cast(DoubleType).as("_a_x"), col("A_Y_CH1903").cast(DoubleType).as("_a_y"),
      col("AU_X_CH1903").cast(DoubleType).as("_au_x"), col("AU_Y_CH1903").cast(DoubleType).as("_au_y"))
    val withPurpose = stacked.join(zp, Seq("user_id"), "left")
      .withColumn("purpose",
        when(col("W_X_CH1903") === col("X_CH1903") && col("W_Y_CH1903") === col("Y_CH1903"), "home")
          .when((col("_a_x") === col("X_CH1903") && col("_a_y") === col("Y_CH1903")) ||
            (col("_au_x") === col("X_CH1903") && col("_au_y") === col("Y_CH1903")), "work"))
      .drop("_a_x", "_a_y", "_au_x", "_au_y", "W_X_CH1903", "W_Y_CH1903")

    // dense ids in (block, user, sequence) order — the reference's concat
    // order (all starts, then the per-user tails)
    Ids.withSequentialId(withPurpose, "staypoint_id", col("_block"), col("user_id"), col("ETNR"))
      .drop("_block")
      .withColumn("lon", col("X")).withColumn("lat", col("Y"))
      .drop("X", "Y", "X_CH1903", "Y_CH1903")
  }

  /** Up to 6 verification points per tripleg row, ordered S, R1..R6, E,
    * folded into a LineString vertex array (dataset_reader.py:458-521).
    */
  private def verificationLinestrings(spark: SparkSession, dir: String, tpls: DataFrame): DataFrame = {
    val numPoints = 6
    val vp0 = castCols(
      readCsv(spark, dir, "verifikationspunkte.csv").withColumnRenamed("HHNR", "user_id"),
      "user_id" -> LongType, "ETNR" -> LongType)

    // melt the R1..R6 blocks into (seq, x, y, x_ch, y_ch) rows; -997 is NA
    def clean(c: Column): Column = {
      val d = c.cast(DoubleType)
      when(d === -997.0, lit(null)).otherwise(d)
    }
    val pointStructs = (1 to numPoints).map { i =>
      struct(lit(i).as("seq"),
        clean(col(s"R${i}_X")).as("x"), clean(col(s"R${i}_Y")).as("y"),
        clean(col(s"R${i}_X_CH1903")).as("xc"), clean(col(s"R${i}_Y_CH1903")).as("yc"))
    }
    val melted = vp0.select(col("user_id"), col("ETNR"), explode(array(pointStructs: _*)).as("p"))
      .select(col("user_id"), col("ETNR"), col("p.seq"), col("p.x"), col("p.y"), col("p.xc"), col("p.yc"))

    // tripleg start (seq 0) and end (seq 7) complete the LineString
    def endpoint(prefix: String, seq: Int) = tpls.select(
      col("user_id"), col("ETNR"), lit(seq).as("seq"),
      col(s"${prefix}X").cast(DoubleType).as("x"), col(s"${prefix}Y").cast(DoubleType).as("y"),
      col(s"${prefix}X_CH1903").cast(DoubleType).as("xc"), col(s"${prefix}Y_CH1903").cast(DoubleType).as("yc"))

    val allPoints = endpoint("S_", 0)
      .unionByName(melted)
      .unionByName(endpoint("Z_", numPoints + 1))

    allPoints
      .groupBy(col("user_id"), col("ETNR"))
      .agg(
        transform(
          filter(array_sort(collect_list(struct(col("seq"), col("x").as("lon"), col("y").as("lat")))),
            p => p.getField("lon").isNotNull && p.getField("lat").isNotNull),
          p => struct(p.getField("lon").as("lon"), p.getField("lat").as("lat"))).as("vp_xy"),
        transform(
          filter(array_sort(collect_list(struct(col("seq"), col("xc").as("x"), col("yc").as("y")))),
            p => p.getField("x").isNotNull && p.getField("y").isNotNull),
          p => struct(p.getField("x").as("x"), p.getField("y").as("y"))).as("vp_xy_ch1903"))
  }
}
