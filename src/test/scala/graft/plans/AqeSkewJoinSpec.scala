package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE runtime skew handling — the automatic counterpart of the manual
  * [[graft.operators.SkewJoin]] salting: when one join key carries most
  * of the rows, adaptive execution must split the oversized partition
  * into parallel sub-joins at runtime (`skew=true` in the final plan)
  * instead of letting one task process the whole hot key. At 100 TB a
  * single hot key otherwise turns a 1000-executor join into one
  * straggler task.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("a hot key triggers AQE skew-join splitting in the final plan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // shrink thresholds so the test-scale hot partition counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // force a sort-merge join: broadcasting the small side would
      // sidestep the skew machinery entirely
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // 50k fact rows, 90% on key 7; dim has one row per key
      val fact = spark.range(50000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, Seq("k"))
      // collect() drives THIS queryExecution so the adaptive plan is
      // final when inspected (count() would execute a different one)
      assert(joined.collect().length == 50000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"setup must produce a sort-merge join:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition's join as skew-handled:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
