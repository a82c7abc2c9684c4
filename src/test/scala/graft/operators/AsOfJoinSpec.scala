package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, "l0"), (1L, 200L, "l1"), (2L, 50L, "l2"))
    .toDF("user_id", "t_us", "tag")
  private val right = Seq(
    (1L, 100L, "r_at_100"), (1L, 150L, "r_at_150"), (2L, 500L, "r_late"))
    .toDF("user_id", "t_us", "label")

  test("each left row gets the latest right row at or before its timestamp") {
    val out = AsOfJoin.asOf(left, right).orderBy("user_id", "t_us").collect()
    assert(out(0).getAs[String]("right_label") == "r_at_100") // equal ts matches
    assert(out(1).getAs[String]("right_label") == "r_at_150")
    assert(out(2).isNullAt(out(2).fieldIndex("right_label"))) // nothing before -> null
    // left payload columns survive untouched
    assert(out.map(_.getAs[String]("tag")).toSeq == Seq("l0", "l1", "l2"))
  }

  test("tolerance nulls out matches that are too old") {
    val out = AsOfJoin.asOf(left, right, toleranceUs = Some(40L))
      .orderBy("user_id", "t_us").collect()
    assert(out(0).getAs[String]("right_label") == "r_at_100") // age 0 <= 40
    assert(out(1).isNullAt(out(1).fieldIndex("right_label"))) // age 50 > 40
  }

  test("equal-timestamp right rows resolve by the tiebreak column") {
    val dupRight = Seq((1L, 100L, 1L, "low"), (1L, 100L, 9L, "high"))
      .toDF("user_id", "t_us", "prio", "label")
    val out = AsOfJoin.asOf(left.filter($"t_us" === 100L), dupRight, tiebreakCol = Some("prio"))
      .collect()
    assert(out.head.getAs[String]("right_label") == "high")
  }
}
