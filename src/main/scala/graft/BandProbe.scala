package graft

import graft.operators._
import graft.sources._
import org.apache.spark.sql.functions._

/** Dev-only probe: cost of the banded co-location candidate join vs the
  * time-band width (the one perf knob whose setting the OUTPUT is
  * invariant to — only candidate volume changes). Run at sf0.1 to pick
  * the default; results recorded in SpatialOps.colocationMeetings's
  * scaladoc.
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iv = EventsAdapter.intervals(spark, dir).localCheckpoint(eager = true)

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    t("warmup") { spark.range(1000000).count() }
    for (b <- Seq(240.0, 120.0, 60.0, 30.0, 15.0); _ <- 1 to 2)
      t(s"meetings_b$b") { SpatialOps.colocationMeetings(iv, 10000L, b).count() }
    for (b <- Seq(120.0, 30.0))
      t(s"pairs_b$b") {
        SpatialOps.colocationPairsFromMeetings(
          SpatialOps.colocationMeetings(iv, 10000L, b)).count()
      }
    val pairs = SpatialOps.colocationPairsFromMeetings(
      SpatialOps.colocationMeetings(iv, 10000L, 120.0)).localCheckpoint(eager = true)
    for (_ <- 1 to 3)
      t("components_distrib") { SpatialOps.colocationComponents(pairs).count() }
    val mts = SpatialOps.colocationMeetings(iv, 10000L, 120.0).localCheckpoint(eager = true)
    for (_ <- 1 to 3)
      t("convoy_pairs") { SpatialOps.convoyPairs(mts, 120.0, 2).count() }
    // 10x users with replicas shifted one degree: different replicas never
    // meet (the fair linear growth model, as in ScaleProbe's pagerank_10x)
    val iv10 = (0 until 10).map(i =>
        EventsAdapter.intervals(spark, dir)
          .select(col("id"), (col("user_id") + i * 100000L).as("user_id"),
            col("s_us"), col("f_us"), (col("lon") + i * 1.0).as("lon"), col("lat")))
      .reduce(_.unionAll(_)).localCheckpoint(eager = true)
    // meetings at 10x are ~61M rows — too wide to pin as driver-memory
    // blocks next to the 1x frames, so each probe keeps the meetings
    // join in its lineage (same attribution as ScaleProbe's
    // pagerank_10x: an op costs its input plus its own bounded work);
    // the shared PAIR table is small (11M rows) and checkpoints lazily
    t("meetings_10x") { SpatialOps.colocationMeetings(iv10, 10000L, 120.0).count() }
    val pairs10 = SpatialOps.colocationPairsFromMeetings(
      SpatialOps.colocationMeetings(iv10, 10000L, 120.0)).localCheckpoint(eager = false)
    t("convoy_10x") {
      SpatialOps.convoyPairs(
        SpatialOps.colocationMeetings(iv10, 10000L, 120.0), 120.0, 2).count()
    }
    // isolate the convoy work from the meetings join (needs the
    // SPARK_DRIVER_MEM=24g probe heap to pin 61M meeting rows)
    if (sys.env.contains("SPARK_GRAFT_PROBE_PIN")) {
      val mts10p = SpatialOps.colocationMeetings(iv10, 10000L, 120.0)
        .localCheckpoint(eager = true)
      for (_ <- 1 to 2)
        t("convoy_10x_pinned") { SpatialOps.convoyPairs(mts10p, 120.0, 2).count() }
      // A/B: does a map-side-combinable distinct on (pair, range) pay
      // for its extra exchange by shrinking the window shuffle?
      val bandUs = 7200000000L
      val ranged = mts10p.select(col("user_a"), col("user_b"),
        floor(col("m_s_us") / lit(bandUs.toDouble)).cast("long").as("_bs"),
        floor(greatest(col("m_f_us") - 1, col("m_s_us")) / lit(bandUs.toDouble)).cast("long").as("_bf"))
      t("ranges_distinct_10x") { ranged.distinct().count() }
    }
    t("assortativity_10x") { SpatialOps.colocationAssortativity(pairs10).count() }
    t("components_10x") { SpatialOps.colocationComponents(pairs10).count() }
    spark.stop()
  }
}
