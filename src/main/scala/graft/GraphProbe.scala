package graft

import graft.operators.SpatialOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only 10× probe of the ITERATIVE contact-graph operators (round-10
  * item: LPA's per-round join is degree-shaped and was untested beyond
  * sf0.1). Three graph models over the sf0.1 contact pairs (~1.1M):
  *
  *  - ×10 fair: ten disjoint shifted replicas — 11M pairs, same degree
  *    distribution, 10× nodes. Tests round cost and Share.materialize
  *    behavior at 10× edges.
  *  - ×10 hub: user_a keeps its id, user_b shifts per replica — 11M
  *    pairs where every a-side node's degree multiplies ×10. Tests the
  *    per-node argmax window (width ∝ degree) and the label join under
  *    degree skew, the raised-density analogue for the ITERATIVE stage
  *    (DensityProbe already prices the pair-JOIN under raised density).
  *
  * Also prints the exact-decimal modularity headroom: the largest
  * |4W·w_in − d²| term vs DECIMAL(38,0)'s 1e38 ceiling, so "the decimal
  * numerators hold at 10×" is a measured statement. Results recorded in
  * SURVEY.md §6.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    t("warmup") { spark.range(1000000).count() }

    val pairs1 = Pipeline.colocationPairs(spark, dir)
      .select(col("user_a"), col("user_b"), col("n_meetings"))
      .localCheckpoint(eager = true)
    t("pairs_1x") { pairs1.count() }

    val S = 100000000L
    val pairs10 = (0 until 10).map(i => pairs1.select(
        (col("user_a") + i * S).as("user_a"), (col("user_b") + i * S).as("user_b"),
        col("n_meetings")))
      .reduce(_.unionAll(_)).localCheckpoint(eager = true)
    t("pairs_10x_fair") { pairs10.count() }

    // hub model: a-side ids shared across replicas → a-degrees ×10. Keep
    // user_a < user_b by pushing the b-replicas above every a id.
    val pairsHub = (0 until 10).map(i => pairs1.select(
        col("user_a"), (col("user_b") + (i + 1) * S).as("user_b"), col("n_meetings")))
      .reduce(_.unionAll(_)).localCheckpoint(eager = true)
    t("pairs_10x_hub") { pairsHub.count() }

    def headroom(tag: String, out: DataFrame): Unit = {
      val r = out.agg(max(col("degree_sum")).as("dmax"), max(col("w_in")).as("wmax"),
          count(lit(1)).as("nc")).collect()(0)
      println(s"[probe] $tag: communities=${r.getLong(2)} max_degree_sum=${r.getLong(0)} " +
        s"max_w_in=${r.getLong(1)}")
    }

    t("lpa_1x") { SpatialOps.colocationCommunities(pairs1, rounds = 3).count() }
    t("lpa_10x_fair") { SpatialOps.colocationCommunities(pairs10, rounds = 3).count() }
    t("lpa_10x_hub") { SpatialOps.colocationCommunities(pairsHub, rounds = 3).count() }
    t("louvain_1x") { SpatialOps.colocationLouvain(pairs1, rounds = 4).count() }
    t("louvain_10x_fair") { SpatialOps.colocationLouvain(pairs10, rounds = 4).count() }
    t("louvain_10x_hub") { SpatialOps.colocationLouvain(pairsHub, rounds = 4).count() }
    t("pagerank_10x_fair") { SpatialOps.colocationPagerank(pairs10, iters = 3).count() }
    t("louvain_l2_1x") { SpatialOps.colocationLouvainL2(pairs1, rounds = 4, rounds2 = 4).count() }
    t("louvain_l2_10x_hub") { SpatialOps.colocationLouvainL2(pairsHub, rounds = 4, rounds2 = 4).count() }
    // the collapsed supergraph stays tiny even at 11M pairs (collapse is
    // the point), so the r13 driver-side fallback handles it; this entry
    // FORCES the distributed phase-2 pass (localThreshold = 0) to show
    // it still engages and completes at 11M-pair scale
    t("louvain_l2_10x_hub_dist") { SpatialOps.colocationLouvainL2(pairsHub, rounds = 4,
      rounds2 = 4, localThreshold = 0L).count() }
    t("connectivity_1x") { SpatialOps.louvainConnectivity(pairs1, rounds = 4).count() }
    t("connectivity_10x_hub") { SpatialOps.louvainConnectivity(pairsHub, rounds = 4).count() }
    t("kcore_1x") { SpatialOps.kCoreHistogram(pairs1, rounds = 3).count() }
    t("kcore_10x_fair") { SpatialOps.kCoreHistogram(pairs10, rounds = 3).count() }
    t("kcore_10x_hub") { SpatialOps.kCoreHistogram(pairsHub, rounds = 3).count() }
    t("richclub_1x") { SpatialOps.richClub(pairs1).count() }
    t("richclub_10x_fair") { SpatialOps.richClub(pairs10).count() }
    t("richclub_10x_hub") { SpatialOps.richClub(pairsHub).count() }

    // decimal-headroom audit at ×10: every modularity numerator term is
    // |4W·w_in − d²| ≤ max(4W·W, (2W)²) = 4W² — print the actual terms
    locally {
      val wTot = pairs10.agg(sum(col("n_meetings")).cast("long")).collect()(0).getLong(0)
      val out = SpatialOps.colocationCommunities(pairs10, rounds = 3)
        .localCheckpoint(eager = true)
      headroom("lpa_10x_fair", out)
      val terms = out.select(
          (lit(4L).cast("decimal(38,0)") * lit(wTot).cast("decimal(38,0)") *
            col("w_in").cast("decimal(38,0)")).as("t1"),
          (col("degree_sum").cast("decimal(38,0)") * col("degree_sum").cast("decimal(38,0)")).as("t2"))
        .agg(max(col("t1")).cast("string"), max(col("t2")).cast("string")).collect()(0)
      println(s"[probe] modularity terms at 10x: W=$wTot 4W*w_in_max=${terms.getString(0)} " +
        s"d2_max=${terms.getString(1)} (DECIMAL(38,0) ceiling 1e38)")
    }
    spark.stop()
  }
}
