package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed ε-grid DBSCAN vs the exact in-memory kernel on the same
  * points: cluster partitions must match (up to label renaming), noise
  * must match exactly — including minPts > 1, where core/border status
  * depends on density (each point's full ε-neighborhood is present in
  * its home cell thanks to the 3×3 halo replication).
  */
class DatasetDbscanSpec extends SparkSpec {
  import spark.implicits._

  private def clustersOf(pairs: Seq[(Long, Long)]): Set[Set[Long]] =
    pairs.filter(_._2 != -1L).groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  test("grid-partitioned dataset DBSCAN equals in-memory DBSCAN (minPts 1 and 2)") {
    val rnd = new scala.util.Random(11)
    // three blobs ~60m wide spaced ~500m, plus isolated noise points;
    // blob centers chosen to straddle grid-cell borders
    val pts = (0 until 90).map { i =>
      val blob = i % 3
      val (bx, by) = Seq((8.5000, 47.3000), (8.5060, 47.3030), (8.5125, 47.3061))(blob)
      (i.toLong, bx + (rnd.nextDouble() - 0.5) * 0.0006, by + (rnd.nextDouble() - 0.5) * 0.0004)
    } ++ Seq((1000L, 8.60, 47.40), (1001L, 8.70, 47.45))

    val df = pts.toDF("sp_id", "lon", "lat").withColumn("user_id", lit(0L))
      .select("sp_id", "user_id", "lon", "lat")

    for (minPts <- Seq(1, 2)) {
      // distributed path (aggLevel = dataset)
      val sp = df.select(col("sp_id").as("id"), col("user_id"),
        to_timestamp(lit("2023-01-01 00:00:00")).as("started_at"),
        to_timestamp(lit("2023-01-01 01:00:00")).as("finished_at"), col("lon"), col("lat"))
      val (spOut, _) = LocationGenerator.generate(sp,
        LocationGenerator.Params(epsilonMeters = 100, numSamples = minPts, aggLevel = "dataset"))
      val got = spOut.select(col("id"), coalesce(col("location_id"), lit(-1L)))
        .as[(Long, Long)].collect().toSeq

      // exact in-memory kernel on the same data
      val ordered = pts.sortBy(_._1)
      val labels = LocationGenerator.dbscan(
        ordered.map(_._2).toArray, ordered.map(_._3).toArray, 100, minPts)
      val want = ordered.map(_._1).zip(labels.map(_.toLong))

      assert(clustersOf(got) == clustersOf(want), s"cluster partition mismatch at minPts=$minPts")
      assert(got.filter(_._2 == -1L).map(_._1).toSet == want.filter(_._2 == -1L).map(_._1).toSet,
        s"noise mismatch at minPts=$minPts")
    }
  }

  test("border-merge chain spanning ~30 grid cells merges into ONE cluster") {
    // 60 points in a west-east line ~90 m apart (< eps 100 m): one
    // ε-chain crossing ~27 of the 2ε-wide grid cells, so the cluster
    // graph is a ~27-link path — deeper than the 15 rounds the old
    // in-place min-label CC silently capped at (it would return split
    // clusters); the hook+compress doubling loop converges and throws
    // rather than truncate
    val pts = (0 until 60).map(i => (i.toLong, 8.5 + i * 0.0012, 47.3))
    val sp = pts.toDF("id", "lon", "lat").withColumn("user_id", lit(0L))
      .select(col("id"), col("user_id"),
        to_timestamp(lit("2023-01-01 00:00:00")).as("started_at"),
        to_timestamp(lit("2023-01-01 01:00:00")).as("finished_at"), col("lon"), col("lat"))
    val (spOut, locs) = LocationGenerator.generate(sp,
      LocationGenerator.Params(epsilonMeters = 100, numSamples = 1, aggLevel = "dataset"))
    assert(locs.select(col("id")).distinct().count() == 1L,
      "the 60-point ε-chain must be a single dataset-level location")
    assert(spOut.filter(col("location_id").isNull).count() == 0L)
  }

  // port of tests/preprocessing/test_staypoints.py:314-352
  // (test_dbscan_min / test_dbscan_max / test_missing_link)
  test("epsilon extremes: ~0 gives one location per staypoint, huge minPts gives none") {
    val sp = (0 until 12).map { i =>
      (i.toLong, (i % 3).toLong, 8.5 + i * 0.01, 47.3 + i * 0.005)
    }.toDF("id", "user_id", "lon", "lat")
      .select(col("id"), col("user_id"),
        to_timestamp(lit("2023-01-01 00:00:00")).as("started_at"),
        to_timestamp(lit("2023-01-01 01:00:00")).as("finished_at"), col("lon"), col("lat"))

    for (agg <- Seq("user", "dataset")) {
      // epsilon ~ 0: clustering must not reduce the count
      val (_, locsMin) = LocationGenerator.generate(sp,
        LocationGenerator.Params(epsilonMeters = 1e-18, numSamples = 1, aggLevel = agg))
      assert(locsMin.count() == 12L, s"agg=$agg")
      // ids stay dense 0..n-1 regardless of agg level
      assert(locsMin.agg(min(col("id")), max(col("id"))).as[(Long, Long)].head() == (0L, 11L))

      // minPts larger than any neighborhood: everything is noise, the
      // locations table is empty and every staypoint link is null
      val (spMax, locsMax) = LocationGenerator.generate(sp,
        LocationGenerator.Params(epsilonMeters = 1e18, numSamples = 1000, aggLevel = agg))
      assert(locsMax.count() == 0L, s"agg=$agg")
      assert(spMax.filter(col("location_id").isNotNull).count() == 0L, s"agg=$agg")
    }
  }
}
