package graft

import graft.operators.SpatialOps
import graft.sources.EventsAdapter
import org.apache.spark.sql.functions._

/** Dev-only 10× probe of the trajectory-distance family (round-10 item:
  * the all-pairs DTW/Fréchet/Hausdorff matrix is contract-bounded to
  * small X×Y — what's the scale path?). Builds the full sf0.1 line set
  * (every user, 10 blocks each — ~50× the matrix gates' fixture) and
  * compares:
  *
  *  1. the all-pairs kernel volume (priced, not run, beyond a slice —
  *     it is quadratic by definition);
  *  2. trajectoryNearPairs' banded candidate volume and wall time —
  *     the padded-bbox grid join that replaces corpus² with
  *     spatially-co-located pairs only.
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

    // banded near-pairs over the FULL line set
    t("near_pairs_banded") {
      SpatialOps.trajectoryNearPairs(lines, radiusM = 300.0).count()
    }
    // candidate volume the band admits (kernel input size) vs all-pairs
    t("banded_candidates") {
      SpatialOps.trajectoryNearPairs(lines, radiusM = 1e9,
        cellMicroDeg = 10000L, padMicroDeg = 6000L).count()
    }
    // all-pairs matrix on a slice that matches the banded candidate
    // count, to price the kernel-per-pair cost both shapes share
    t("all_pairs_300_lines") {
      SpatialOps.distanceMatrixLinestrings(
        lines.filter(col("user_id") < 30), "hausdorff").count()
    }
    spark.stop()
  }
}
