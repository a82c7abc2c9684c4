package graft

import graft.operators.TourGenerator
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the tours_gaps gate cost (round-9 watch
  * item): trips materialization vs the gap-budget tour scan itself.
  */
object TourProbe {
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
    t("staypoints") { Pipeline.staypoints(spark, dir).count() }
    t("staypoints_act") { Pipeline.staypointsWithActivity(spark, dir).count() }
    t("triplegs") { Pipeline.triplegs(spark, dir).count() }
    t("trips_materialize") { Pipeline.trips(spark, dir).count() }
    for (r <- 1 to 3)
      t(s"tours_gaps_scan_r$r") {
        TourGenerator.generate(Pipeline.trips(spark, dir), None,
          TourGenerator.Params(maxDistMeters = 200.0, maxTimeDays = 30.0, maxNrGaps = 1),
          share = _.localCheckpoint(false))._2.queryExecution.toRdd.count()
      }
    for (r <- 1 to 2)
      t(s"tours_plain_scan_r$r") {
        TourGenerator.generate(Pipeline.trips(spark, dir), None,
          TourGenerator.Params(maxDistMeters = 200.0, maxTimeDays = 30.0),
          share = _.localCheckpoint(false))._2.queryExecution.toRdd.count()
      }
    spark.stop()
  }
}
