package graft

import graft.operators.SpatialOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scaling probe for the radiation-model pair: the exact zones² window
  * form vs the ring-banded bounded twin, at 1× and 10× zone counts —
  * the SURVEY §6 evidence that the ringed path is the planet-scale
  * plan. Synthetic grid: `zones` cells in a √z × √z block of 0.01°
  * cells, 3 points each (populations m = 3 everywhere; the cost driver
  * is the pair space, not the mass distribution).
  *
  * Expected shape: exact grows ~quadratically in zones (every origin
  * windows over every destination); ringed grows ~linearly (per-origin
  * neighborhood bounded by the cap, candidates via the block equi-join).
  */
object RadiationProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus)

    def grid(zones: Int, perZone: Int): DataFrame = {
      val side = math.ceil(math.sqrt(zones.toDouble)).toInt
      spark.range(zones.toLong * perZone)
        .select((col("id") % zones).as("_z"))
        .select(
          ((col("_z") % side).cast("double") * 0.01 + 0.005).as("lon"),
          (lit(40.0) + floor(col("_z") / side).cast("double") * 0.01 + 0.005).as("lat"))
        .localCheckpoint(true)
    }

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[radiation-probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }

    for (zones <- Seq(2000, 20000)) {
      val pts = grid(zones, 3)
      pts.count()
      // exact zones² only at the small scale: at 20k zones the window
      // form is 400M pairs through per-origin sorts — the probe's point
      // is that you don't run it there
      if (zones <= 2000)
        t(s"exact_z$zones") {
          SpatialOps.radiationFlows(pts, cellMicroDeg = 10000L, refLatDeg = 40.0)
            .queryExecution.toRdd.count()
        }
      t(s"ringed_z$zones") {
        SpatialOps.radiationFlowsRinged(pts, cellMicroDeg = 10000L, refLatDeg = 40.0,
          ringWidthCells = 4L, maxRings = 2).queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
