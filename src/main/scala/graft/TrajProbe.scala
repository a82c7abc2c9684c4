package graft

import graft.operators.SpatialOps
import graft.sources.EventsAdapter
import org.apache.spark.sql.functions._

/** Dev-only 10× probe of the trajectory-distance family (round-10 item:
  * the all-pairs DTW/Fréchet/Hausdorff matrix is contract-bounded to
  * small X×Y — what's the scale path?). Two geometries over the full
  * sf0.1 line set (~9k lines, all-pairs 40.8M):
  *
  *  - PACKED (the raw synthetic data): every trajectory lives in one
  *    0.03°×0.015° neighborhood — ~15 distinct grid cells service all
  *    40.8M pairs, so banding CANNOT separate and the candidate join
  *    degenerates to all-pairs through a handful of hot cells (first
  *    probe attempt: killed after 15 min — the colocation monster-cell
  *    regime in pair space; recorded, not re-run). Spatial banding is a
  *    geometry lever, not magic: one-neighborhood corpora need the
  *    spreadFactor-style pair-space tiling instead.
  *  - DISPERSED (per-user offsets spread users across a 64×64
  *    neighborhood grid — honest synthetic geography for a corpus that
  *    spans a region): banding admits only same-neighborhood pairs and
  *    the whole near-pair search completes in seconds. An all-pairs
  *    kernel slice prices what brute force would cost at the same size.
  *
  * Results recorded in SURVEY.md §6.
  */
object TrajProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    t("warmup") { spark.range(1000000).count() }

    val lines = EventsAdapter.positionfixes(spark, dir)
      .groupBy(col("user_id"), expr("k div 12").as("block"))
      .agg(transform(array_sort(collect_list(struct(col("k"), col("lon"), col("lat")))),
        p => struct(p.getField("lon").as("lon"), p.getField("lat").as("lat"))).as("points"))
      .withColumn("id", col("user_id") * 10000 + col("block"))
      .filter(col("block") < 10)
      .localCheckpoint(eager = true)
    val n = lines.count()
    println(s"[probe] lines=$n  all_pairs=${n * (n - 1) / 2}")

    // dispersed geography: users spread over a 64×64 neighborhood grid
    val spread = lines
      .withColumn("_u", expr("id div 10000"))
      .withColumn("points", transform(col("points"), p => struct(
        (p.getField("lon") + pmod(col("_u"), lit(64)) * 0.04).as("lon"),
        (p.getField("lat") + pmod(expr("_u div 64"), lit(64)) * 0.02).as("lat"))))
      .drop("_u")
      .localCheckpoint(eager = true)
    t("spread_lines") { spread.count() }

    t("near_pairs_dispersed") {
      SpatialOps.trajectoryNearPairs(spread, radiusM = 300.0).count()
    }
    // candidate volume the band admits on the dispersed geometry (the
    // 300 m / 66° derived pad — same envelope the near-pair gate pays)
    t("candidates_dispersed") {
      SpatialOps.trajectoryBandCandidates(spread, 10000L, 6634L, 1).count()
    }
    // all-pairs kernel slice (900 lines ≈ 404k pairs) to price brute
    // force per pair at the same kernel
    t("all_pairs_900_lines") {
      SpatialOps.distanceMatrixLinestrings(
        spread.filter(col("id") < 900000), "hausdorff").count()
    }
    // PACKED geometry + pair-space tiling: the raw one-neighborhood
    // layout that degenerated the untiled join (killed at 15 min) —
    // spreadFactor g=8 splits each hot cell's quadratic output across
    // 64 tiles, so the inherent 40.8M-pair volume at least parallelizes
    t("packed_g8_300m") {
      SpatialOps.trajectoryNearPairs(lines, radiusM = 300.0, spreadFactor = 8).count()
    }
    spark.stop()
  }
}
