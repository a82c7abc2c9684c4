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
    },

    // ----- training-data pipeline: dedup ------------------------------
    "dedup_exact" -> { (s, dir) =>
      Dedup.exact(s.read.parquet(s"$dir/documents.parquet"))
    },
    "dedup_minhash" -> { (s, dir) =>
      Dedup.minHashLsh(s.read.parquet(s"$dir/documents.parquet"), verifyThreshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
    },
    "dedup_simhash" -> { (s, dir) =>
      Dedup.simHashPairs(s.read.parquet(s"$dir/documents.parquet"), maxHamming = 3)
        .withColumn("hamming", col("hamming").cast("long"))
    },
    "dedup_ngram_jaccard" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Dedup.ngramJaccardTop1(docs.filter(col("doc_id") < 10), docs)
    },

    // ----- training-data pipeline: similarity search ------------------
    "ann_bruteforce" -> { (s, dir) =>
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    "ann_lsh" -> { (s, dir) =>
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Ann.lshTopK(emb.filter(col("vec_id") < 10), emb, k = 5, planes = 8)
    },
    "embedding_neardup" -> { (s, dir) =>
      Dedup.embeddingNearDup(s.read.parquet(s"$dir/embeddings.parquet"), threshold = 0.3, planes = 8)
        .withColumn("cosine", round(col("cosine"), 6))
    },

    // ----- training-data pipeline: text analysis ----------------------
    "text_langid" -> { (s, dir) =>
      TextAnalysis.languageId(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("lang"), col("score_de"), col("score_en"),
          col("score_es"), col("score_fr"), col("predicted_lang"))
    },
    "text_quality" -> { (s, dir) =>
      TextAnalysis.qualityScore(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("n_chars"), col("n_words"), col("mean_word_len"),
          col("stopword_ratio"), col("digit_ratio"), col("quality_ok"))
    },
    "token_count" -> { (s, dir) =>
      TextAnalysis.tokenCount(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"))
    },
    "doc_fingerprint" -> { (s, dir) =>
      TextAnalysis.fingerprint(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("md5_fp"), col("min_word_fp"))
    },

    // ----- training-data pipeline: multimodal plumbing (stub kernel) --
    "multimodal_features" -> { (s, dir) =>
      val media = Multimodal.asMediaTable(s.read.parquet(s"$dir/documents.parquet"))
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("n_bytes"), col("byte_checksum"))
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
         |GROUP BY i.user_id""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, list_distinct(CASE WHEN len(string_split(text,' ')) >= 3
         |    THEN list_transform(range(0, len(string_split(text,' ')) - 2),
         |         i -> array_to_string(string_split(text,' ')[i+1:i+3], ' '))
         |    ELSE [array_to_string(string_split(text,' '), ' ')] END) AS s
         |  FROM documents
         |), scored AS (
         |  SELECT p.doc_id AS probe_id, c.doc_id AS match_id,
         |         CAST(len(list_intersect(p.s, c.s)) AS DOUBLE) /
         |         CAST(len(list_distinct(list_concat(p.s, c.s))) AS DOUBLE) AS jaccard
         |  FROM sh c, (SELECT * FROM sh WHERE doc_id < 10) p
         |  WHERE p.doc_id != c.doc_id)
         |SELECT probe_id, match_id, jaccard FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY jaccard DESC, match_id) AS rn
         |  FROM scored) WHERE rn = 1""".stripMargin,
    "ann_bruteforce" ->
      """WITH probes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |    round(
        |      list_sum(list_transform(list_zip(p.embedding, c.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(p.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
        |  FROM embeddings c, probes p WHERE p.vec_id != c.vec_id)
        |SELECT probe_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,
    "text_langid" ->
      """SELECT doc_id, lang,
        |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','nicht'))) AS BIGINT) AS score_de,
        |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS score_en,
        |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y','que'))) AS BIGINT) AS score_es,
        |  CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','les','des'))) AS BIGINT) AS score_fr,
        |  CASE WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
        |       WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
        |       WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
        |       ELSE 'fr' END AS predicted_lang
        |FROM documents""".stripMargin,
    "text_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS stop_hits,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits
        |  FROM documents)
        |SELECT doc_id, n_chars, n_words,
        |  CASE WHEN n_words > 0 THEN CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END AS mean_word_len,
        |  CASE WHEN n_words > 0 THEN CAST(stop_hits AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
        |  CASE WHEN n_chars > 0 THEN CAST(n_digits AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS digit_ratio,
        |  (n_words >= 5 AND
        |   (CASE WHEN n_words > 0 THEN CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END) >= 2.0 AND
        |   (CASE WHEN n_words > 0 THEN CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END) <= 12.0 AND
        |   (CASE WHEN n_chars > 0 THEN CAST(n_digits AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END) <= 0.3) AS quality_ok
        |FROM q""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS BIGINT) AS bpe_tokens
        |FROM documents""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS md5_fp,
        |  array_to_string(list_sort(list_distinct(
        |    list_transform(string_split(text,' '), w -> substring(md5(w),1,8))))[1:4], '-') AS min_word_fp
        |FROM documents""".stripMargin
  )
}
