package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CircularStatsSpec extends SparkSpec {
  import spark.implicits._

  private val HOUR = 3600000000L

  test("diurnal concentration: all-one-hour user reads mrl2 = 1 and concentrated") {
    // user 1: 10 events all at hour 9 (different days) -> R̄² = 1
    // user 2: 4 events at hours 0, 6, 12, 18 -> perfectly balanced, R̄² ≈ 0
    val events = (
      (0 until 10).map(i => (1L, 9L * HOUR + i * 24L * HOUR)) ++
      Seq((2L, 0L), (2L, 6L * HOUR), (2L, 12L * HOUR), (2L, 18L * HOUR)))
      .toDF("user_id", "t_us")
    val got = EventOps.diurnalConcentration(events)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val (n1, rx1, ry1, m1, c1) = got(1L)
    assert(n1 == 10L && rx1 == 10L * EventOps.hourCosQ(9) && ry1 == 10L * EventOps.hourSinQ(9))
    assert(math.abs(m1 - 1.0) < 1e-5 && c1) // quantized cos/sin: ~6e-7 off unity
    val (n2, rx2, ry2, m2, c2) = got(2L)
    // quantized opposite hours cancel exactly: cos table is antisymmetric
    // at 12-hour offsets by construction of the rounding
    assert(n2 == 4L && rx2 == 0L && ry2 == 0L && m2 == 0.0 && !c2)
  }

  test("the quantized trig tables are the injected single source of truth") {
    assert(EventOps.hourCosQ(0) == 1000000L && EventOps.hourSinQ(6) == 1000000L)
    assert(EventOps.hourCosQ(12) == -1000000L)
    assert(EventOps.diurnalConcentrationSql().contains(EventOps.hourCosQ.mkString("[", ", ", "]")))
  }

  test("good-turing: hapax and dis legomena exact per source") {
    val docs = Seq(
      (0L, "a", "a b b c c c"),   // a:1 b:2 c:3 -> hapax 1, dis 1, N=6, V=3
      (1L, "b", "x x"))           // x:2 -> hapax 0, dis 1, N=2, V=1
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.goodTuring(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got("a") === ((6L, 3L, 1L, 1L, 1.0 / 6.0)))
    assert(got("b") === ((2L, 1L, 0L, 1L, 0.0)))
  }
}
