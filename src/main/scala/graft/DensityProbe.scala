package graft

import graft.operators.SpatialOps
import graft.sources.EventsAdapter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only raised-density co-location probe (round-9 item: the UNFAIR
  * scaling model). The standard 10× probe shifts replicas apart so
  * per-cell density stays constant — the fair model for more users over
  * more territory. This probe maps replicas into the SAME cells with
  * DISTINCT user ids (density ×N), so the (cell, band) candidate volume
  * grows quadratically — the hot-urban-cell worst case that is inherent
  * to co-location detection, not to this plan. Measures:
  *
  *  1. meeting-detection time and output volume at density ×1/×4/×10
  *     (expect ~N² growth in candidates — the probe prices it honestly);
  *  2. the per-(cell, band) candidate concentration (top key's share);
  *  3. whether AQE's skew-join rule actually splits the hot (cell, band)
  *     reduce partitions at runtime (plan markers `skew=true` /
  *     AQEShuffleRead skewed counts), with the skew thresholds lowered
  *     to probe scale (256 MB partitions don't exist at sf0.1).
  *
  * Results recorded in SURVEY.md §6.
  */
object DensityProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      // probe-scale AQE skew thresholds: the rule fires on partitions
      // over max(threshold, factor × median) — production defaults
      // (256 MB) can never trigger on a 100 MB testset, so scale them
      // down to observe the mechanism itself
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    val iv = EventsAdapter.intervals(spark, dir)
      .select(col("user_id"), col("s_us"), col("f_us"), col("lon"), col("lat"))
      .localCheckpoint(eager = true)

    // density ×n: identical space-time trajectories under distinct users
    def dens(n: Int): DataFrame =
      (0 until n).map(i => iv.select((col("user_id") + i * 10000000L).as("user_id"),
          col("s_us"), col("f_us"), col("lon"), col("lat")))
        .reduce(_.unionAll(_)).localCheckpoint(eager = true)

    t("warmup") { spark.range(1000000).count() }

    // candidate concentration: intervals per (cell, band) at ×10 — the
    // quadratic driver. Report the hot key vs the mean.
    locally {
      val bandUs = (120.0 * 60e6).toLong
      def cell(c: org.apache.spark.sql.Column) =
        floor(floor(c * 1e6 + lit(0.5)).cast("long").cast("double") / 10000.0).cast("long")
      val keys = dens(10)
        .select(cell(col("lon")).as("cx"), cell(col("lat")).as("cy"),
          explode(sequence(floor(col("s_us") / lit(bandUs.toDouble)).cast("long"),
            floor(greatest(col("f_us") - 1, col("s_us")) / lit(bandUs.toDouble)).cast("long")))
            .as("band"))
        .groupBy("cx", "cy", "band").count()
      val stats = keys.agg(count(lit(1)), max(col("count")), avg(col("count")),
        sum(col("count") * col("count"))).collect()(0)
      println(s"[probe] x10 (cell,band) keys=${stats.getLong(0)} hottest=${stats.getLong(1)} " +
        f"mean=${stats.getDouble(2)}%.1f sum_sq(pair proxy)=${stats.getLong(3)}")
    }

    for (n <- Seq(1, 4, 10)) {
      val ivn = dens(n)
      for (r <- 1 to 2)
        t(s"meetings_x${n}_r$r") { SpatialOps.colocationMeetings(ivn, 10000L, 120.0).count() }
    }

    // AQE skew evidence: execute THIS query execution so the adaptive
    // final plan (with any skew splits) is inspectable afterwards
    locally {
      val m = SpatialOps.colocationMeetings(dens(10), 10000L, 120.0)
      val qe = m.queryExecution
      t("meetings_x10_skewrun") { qe.toRdd.count() }
      val p = qe.executedPlan.toString
      val skewJoins = "skew=true".r.findAllIn(p).length
      val skewReads = "AQEShuffleRead".r.findAllIn(p).length
      println(s"[probe] x10 final plan: skew=true markers=$skewJoins, AQEShuffleRead nodes=$skewReads")
      println(p.linesIterator.filter(l =>
        l.contains("skew") || l.contains("AQEShuffleRead") || l.contains("SortMergeJoin"))
        .take(12).mkString("[probe-plan] ", "\n[probe-plan] ", ""))
    }

    // pair-space spreading at x10 density (hash-mixed keys: expect parity,
    // the knob is for single dominant keys — see the monster leg below)
    for (g <- Seq(1, 4); r <- 1 to 2)
      t(s"meetings_x10_g${g}_r$r") {
        SpatialOps.colocationMeetings(dens(10), 10000L, 120.0, spreadFactor = g).count()
      }

    // monster-cell leg: 20k distinct users, one overlapping interval each,
    // ONE cell and ONE band — the entire ~2·10⁸-pair output lands in a
    // single reduce task at g = 1; spreading tiles it over g² tasks
    locally {
      val monster = spark.range(20000).select(
        col("id").as("user_id"), lit(0L).as("s_us"), lit(3600000000L).as("f_us"),
        lit(-122.4).as("lon"), lit(47.6).as("lat"))
        .repartition(32).localCheckpoint(eager = true)
      // at probe scale Spark rightly broadcasts a 20k-row side and no
      // reduce straggler exists; at 100 TB neither side broadcasts, so
      // force the sort-merge path the big-data plan would take
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // AQE partition coalescing is as output-blind as its skew rule: it
      // merges the spread tiles back together because their INPUT bytes
      // are tiny (the whole point is that their OUTPUT isn't) — at probe
      // scale it must be off to observe the tiling; at 100 TB the tiles'
      // inputs exceed the advisory size and coalescing leaves them alone
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      for (g <- Seq(1, 4, 8); r <- 1 to 2)
        t(s"monster_smj_g${g}_r$r") {
          SpatialOps.colocationMeetings(monster, 10000L, 120.0, spreadFactor = g).count()
        }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    spark.stop()
  }
}
