package graft.plans

import graft.SparkSpec
import graft.sources.Storage
import org.apache.spark.sql.functions._

/** Day-partitioned layout (SURVEY.md §4's time axis): a time-ranged
  * filter must prune to the touched day directories at planning time,
  * and a join against a filtered date dimension must prune at runtime
  * (dynamic partition pruning) — at 100 TB these decide whether a
  * one-week query reads a week or three years of files.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000000L

  test("date filter prunes day partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    // 10 days x 10 events
    val events = (0 until 100).map(i => (i.toLong, (i % 10).toLong * DAY + i * 1000L, s"t$i"))
      .toDF("event_id", "t_us", "payload")
    Storage.writeDayPartitioned(events, dir, mode = "overwrite")
    val filtered = Storage.readDayPartitioned(spark, dir)
      .filter(col("event_date") === "1970-01-03")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("1970-01-03"),
      s"the date predicate must become a partition filter:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(event_date)"),
      s"partition column must not be mistaken for a data column:\n$plan")
    assert(filtered.count() == 10L)
    // planning-time file pruning: the scan's selected partition count is 1
    val scans = filtered.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.toString.contains("1970-01-03")), "scan pinned to one day dir")
  }

  test("join against a filtered date dim prunes partitions dynamically (DPP)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val events = (0 until 1000).map(i => (i.toLong, (i % 10).toLong * DAY + i * 1000L, s"t$i"))
      .toDF("event_id", "t_us", "payload")
    Storage.writeDayPartitioned(events, dir, mode = "overwrite")
    // date dimension with a selective non-partition predicate, so the
    // pruning value is only known at runtime (a parquet dim — a local
    // relation would constant-fold the filter and sidestep the rule)
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    (0 until 10).map(i =>
      (java.sql.Date.valueOf(s"1970-01-${"%02d".format(i + 1)}"), i % 5)).toDF("d", "grp")
      .write.mode("overwrite").parquet(dimDir)
    val joined = Storage.readDayPartitioned(spark, dir)
      .join(spark.read.parquet(dimDir).filter(col("grp") === 3),
        col("event_date") === col("d"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"runtime-filtered dim must trigger dynamic partition pruning:\n$plan")
    assert(joined.count() == 200L) // days 4 and 9 (grp==3): 2 x 100 events
  }

  test("pre-epoch timestamps land in the correct (floor-division) day") {
    val dir = java.nio.file.Files.createTempDirectory("graft-preepoch").toString
    // -1 µs is the last microsecond of 1969-12-31; truncating `div`
    // would misfile it under 1970-01-01
    val events = Seq((1L, -1L, "a"), (2L, -DAY, "b"), (3L, 0L, "c"))
      .toDF("event_id", "t_us", "payload")
    Storage.writeDayPartitioned(events, dir, mode = "overwrite")
    val byDay = Storage.readDayPartitioned(spark, dir)
      .groupBy("event_date").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(byDay == Map("1969-12-31" -> 2L, "1970-01-01" -> 1L), byDay.toString)
  }

  test("default save mode refuses to clobber an existing dataset") {
    val dir = java.nio.file.Files.createTempDirectory("graft-noclobber").toString
    val events = Seq((1L, 0L, "a")).toDF("event_id", "t_us", "payload")
    Storage.writeDayPartitioned(events, dir, mode = "overwrite")
    intercept[Exception] { Storage.writeDayPartitioned(events, dir) }
  }
}
