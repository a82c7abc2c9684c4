package graft

import graft.operators.LocationGenerator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only adversarial-density probe for the DATASET-level DBSCAN
  * path (LocationGenerator.datasetDbscan — the one §2.8 algorithm the
  * round-10 probes never stressed). Two regimes over the sf0.1
  * staypoints:
  *
  *  1. MONSTER CELL: replicas with identical coordinates under fresh
  *     ids (×4/×10 density in the SAME ε-neighborhoods — the
  *     co-location monster-cell model). Stresses the per-cell exact
  *     kernel: each 3×3-halo group grows ×N, and the in-cell sweep is
  *     ~quadratic in group size.
  *  2. BORDER CHAIN: replicas shifted east by 0.9·ε each, so every
  *     original point becomes a 10-link chain of ε-reachable points
  *     spanning many grid cells. Stresses the border-merge connected
  *     components — the regime whose label-propagation depth the old
  *     in-place CC loop silently truncated at 15 rounds (now routed
  *     through Dedup.duplicateClusters' guarded hook+compress loop).
  *
  * Results recorded in SURVEY.md §6.
  */
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    t("warmup") { spark.range(1000000).count() }

    // the synthetic corpus concentrates staypoints into ~4 places, so
    // the FULL sf0.1 table is already monster-cell geometry (measured:
    // dataset_x1 on all 11 831 staypoints = 71 s, kernel-bound in the
    // place cells); the replication curve runs on a 1/16 user slice so
    // the ×10 quadratic stays tractable while the SHAPE is the same
    val spFull = Pipeline.staypoints(spark, dir).localCheckpoint(eager = true)
    t("staypoints_full") { spFull.count() }
    val sp = spFull.filter(pmod(col("user_id"), lit(16)) === 0).localCheckpoint(eager = true)
    t("staypoints_slice") { sp.count() }

    val epsM = 100.0
    // ~0.9 eps eastward per replica at the corpus latitude (47.6 N):
    // 100 m / (111195 * cos 47.6) deg/m
    val stepDeg = 0.9 * epsM / (111194.93 * math.cos(math.toRadians(47.6)))

    def replicas(n: Int, chain: Boolean): DataFrame =
      (0 until n).map { i =>
        val shifted = if (chain) sp.withColumn("lon", col("lon") + lit(i * stepDeg)) else sp
        shifted
          .withColumn("id", col("id") + lit(i * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(i * 10000000L))
      }.reduce(_.unionAll(_)).localCheckpoint(eager = true)

    def run(frame: DataFrame): Long = {
      val (_, locs) = LocationGenerator.generate(frame,
        LocationGenerator.Params(epsilonMeters = epsM, aggLevel = "dataset"),
        _.localCheckpoint(eager = false))
      locs.select(col("id")).distinct().count()
    }

    t("dataset_x1") { run(sp) }
    for (n <- Seq(4, 10)) {
      val monster = replicas(n, chain = false)
      t(s"monster_x$n") { run(monster) }
    }
    for (n <- Seq(4, 10)) {
      val chain = replicas(n, chain = true)
      t(s"chain_x$n") { run(chain) }
    }
    spark.stop()
  }
}
