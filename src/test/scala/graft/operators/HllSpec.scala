package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate is within 3 standard errors of the true cardinality") {
    // 1.04/sqrt(256) = 6.5% rsd; 3 sigma ~ 19.5%
    val docs = (0 until 2000)
      .map(i => ("big", s"w${i % 1500} w${(i * 7) % 1500}"))
      .toDF("source", "text")
    val est = Hll.estimate(Hll.distinctTokens(docs))
      .select("hll_estimate").as[Double].head()
    assert(math.abs(est - 1500.0) / 1500.0 < 0.195, s"estimate $est vs true 1500")
  }

  test("small cardinalities take the exact linear-counting path") {
    val docs = Seq(("s", "a b c d e f g h i j")).toDF("source", "text")
    val row = Hll.estimate(Hll.distinctTokens(docs))
      .select("n_registers", "hll_estimate").as[(Long, Double)].head()
    // 10 distinct tokens, no register collisions expected at m=256 for
    // this fixture (verified: n_registers == 10), so linear counting
    // m*ln(m/(m-10)) = 10.18 -> within 5% of truth
    assert(row._1 == 10L)
    assert(math.abs(row._2 - 10.0) < 0.5, s"linear-counting estimate ${row._2}")
  }

  test("sketch state matches an independent local recomputation bit-for-bit") {
    val docs = Seq(("x", "alpha beta gamma delta"), ("x", "beta epsilon")).toDF("source", "text")
    val got = Hll.distinctTokens(docs)
      .select("n_registers", "n_zero_registers", "sum_pow").as[(Long, Long, Long)].head()

    // independent recomputation from first principles (md5 via JDK)
    val toks = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    toks.foreach { t =>
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val r = h % 256
      val w = h / 256
      val rank = if (w == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      regs(r) = math.max(regs.getOrElse(r, 0), rank)
    }
    val sumPow = regs.values.map(mr => 1L << (53 - mr)).sum
    assert(got == ((regs.size.toLong, 256L - regs.size, sumPow)))
  }

  test("register table partial-aggregates before the exchange (map-side combine)") {
    val docs = Seq(("s", "a b c")).toDF("source", "text")
    val plan = Hll.registerTable(docs.select(col("source"), explode(split(col("text"), " ")).as("t")),
      "source", "t").queryExecution.executedPlan.toString
    // two HashAggregates around a single exchange: partial then final
    assert("(?s)HashAggregate.*Exchange.*HashAggregate".r.findFirstIn(plan).isDefined, plan)
  }
}
