package graft

import org.apache.spark.sql.functions._

/** Dev-only probe: scaling of the auto-banded haversine join
  * ([[graft.plans.BandedDistanceJoin]]) on synthetic point clouds at
  * fixed density. The naive plan is O(|a|·|b|) kernel calls; banded,
  * the kernel volume should track the PAIR DENSITY (points within the
  * radius), i.e. grow linearly when the cloud area grows with n.
  * Results recorded in the rule's scaladoc / SURVEY §6.
  *
  * Two regimes per n:
  *  - fixed-area (densifying): pair volume is quadratic — the honest
  *    lower bound no algorithm beats, banding just avoids the
  *    out-of-radius majority;
  *  - fixed-density (area grows with n): pair volume linear — the
  *    100 TB regime; banded wall clock should be near-linear.
  */
object DistanceJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cloud(n: Long, areaScale: Double, salt: Long) = spark.range(n)
      .select(col("id"),
        (lit(8.5) + (pmod(xxhash64(col("id") + salt), lit(1000000L)).cast("double") / 1e6 - 0.5)
          * lit(0.1 * areaScale)).as("lon"),
        (lit(47.4) + (pmod(xxhash64(col("id") * 31 + salt), lit(1000000L)).cast("double") / 1e6 - 0.5)
          * lit(0.05 * areaScale)).as("lat"))
      .localCheckpoint(true)

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($rows rows)")
    }

    t("warmup") { spark.range(1000000).groupBy(col("id") % 7).count().count() }

    for (n <- Seq(50000L, 100000L, 200000L, 400000L)) {
      // fixed density: area grows with n (scale ~ sqrt(n/50k))
      val s = math.sqrt(n / 50000.0)
      val a = cloud(n, s, 1L); val b = cloud(n, s, 7L)
      for (run <- 1 to 2)
        t(s"banded_fixed_density_n${n}_r$run") {
          a.as("a").join(b.as("b"),
              call_function("haversine_m", col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
                <= lit(100.0))
            .queryExecution.toRdd.count()
        }
    }
    // the Scala-API route (GeoFunctions.haversineMeters — the composed
    // acos/cos kernel the rule matches structurally since r14): must
    // clock like the native-node route above, since it bands to the
    // same plan (the residual evaluates the composed kernel instead of
    // the fused static call; both are whole-stage codegen)
    locally {
      val a = cloud(100000L, math.sqrt(2.0), 1L); val b = cloud(100000L, math.sqrt(2.0), 7L)
      for (run <- 1 to 2)
        t(s"banded_scala_api_n100000_r$run") {
          a.as("a").join(b.as("b"),
              graft.functions.GeoFunctions.haversineMeters(
                col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat")) <= lit(100.0))
            .queryExecution.toRdd.count()
        }
    }
    // semi/anti (blocklist-filter) shape: left row-for-row, right
    // exploded 9x — output is bounded by |left|, so wall clock tracks
    // the probe-side volume, not the pair volume
    locally {
      val a = cloud(200000L, math.sqrt(4.0), 1L); val b = cloud(20000L, math.sqrt(4.0), 7L)
      for (tpe <- Seq("left_semi", "left_anti"); run <- 1 to 2)
        t(s"banded_${tpe}_n200k_b20k_r$run") {
          a.as("a").join(b.as("b"),
              call_function("haversine_m", col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
                <= lit(100.0), tpe)
            .queryExecution.toRdd.count()
        }
    }
    // densifying regime at one size, for the quadratic-pair baseline
    val a = cloud(100000L, 1.0, 1L); val b = cloud(100000L, 1.0, 7L)
    t("banded_fixed_area_n100000") {
      a.as("a").join(b.as("b"),
          call_function("haversine_m", col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
            <= lit(100.0))
        .queryExecution.toRdd.count()
    }
    // PACKED regime (the TrajProbe failure mode: every point inside one
    // band cell, candidate volume |a|x|b|). The per-cell budget must
    // raise in seconds — never the 15-minute quadratic grind — and
    // spreadFactor must complete the same shape tiled across tasks.
    // Broadcast is disabled for the raise entry: with a broadcastable
    // side the plan is a healthy stream-parallel BHJ (no single-task
    // hang to guard); the hang mode is the both-sides-big sort-merge
    // path, where one task owns the whole cell.
    locally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ap = cloud(50000L, 0.001, 1L); val bp = cloud(50000L, 0.001, 7L)
      t("packed_guard_raise_n50000") {
        try ap.as("a").join(bp.as("b"),
            call_function("haversine_m", col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
              <= lit(100.0))
          .queryExecution.toRdd.count()
        catch {
          case e: Throwable if String.valueOf(e.getMessage).contains("hot band-cell") ||
            String.valueOf(String.valueOf(e.getCause)).contains("hot band-cell") => -1L
        }
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // tiled completion at a size whose full pair volume (1e8 rows out)
      // is writable: 10k x 10k packed, 32 tiles -> ~3.1M pairs per task
      val ap2 = cloud(10000L, 0.001, 1L); val bp2 = cloud(10000L, 0.001, 7L)
      spark.conf.set(graft.plans.BandedDistanceJoin.SpreadFactorKey, "32")
      t("packed_tiled_spread32_n10000") {
        ap2.as("a").join(bp2.as("b"),
            call_function("haversine_m", col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
              <= lit(100.0))
          .queryExecution.toRdd.count()
      }
      spark.conf.unset(graft.plans.BandedDistanceJoin.SpreadFactorKey)
    }
    // the un-rewritten BNLJ at the SMALLEST size only (quadratic: 2.5e9
    // kernel calls already)
    spark.conf.set(graft.plans.BandedDistanceJoin.EnabledKey, "false")
    val a0 = cloud(50000L, 1.0, 1L); val b0 = cloud(50000L, 1.0, 7L)
    t("naive_bnlj_n50000") {
      a0.as("a").join(b0.as("b"),
          call_function("haversine_m", col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
            <= lit(100.0))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
