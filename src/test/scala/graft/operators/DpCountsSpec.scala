package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DpCountsSpec extends SparkSpec {
  import spark.implicits._

  /** local reference for the hash-keyed noise of one group value. */
  private def refNoise(salt: String, key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$key".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    def geom(w: Long): Long = if (w == 0) 30L else 30L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    geom(h % (1L << 30)) - geom(h / (1L << 30))
  }

  test("noisy counts equal exact count plus the hash-keyed DLap draw, clamped at 0") {
    val df = (Seq.fill(10)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val got = CorpusOps.dpNoisyCounts(df, "k").as[(String, Long)].collect().toMap
    val exact = Map("a" -> 10L, "b" -> 3L, "c" -> 1L)
    exact.foreach { case (k, n) =>
      assert(got(k) == math.max(n + refNoise("dp", k), 0L), s"group $k")
    }
  }

  test("noise distribution over many keys is symmetric DLap(1/2): P(0) ~ 1/3, mean ~ 0") {
    val draws = (0 until 20000).map(i => refNoise("dp", s"key$i"))
    val p0 = draws.count(_ == 0L).toDouble / draws.size
    assert(math.abs(p0 - 1.0 / 3.0) < 0.02, s"P(Z=0) = $p0")
    val mean = draws.sum.toDouble / draws.size
    assert(math.abs(mean) < 0.03, s"mean = $mean")
    // P(|Z| >= k) decays like (1/2)^k scaled: P(1) + P(-1) = 2*(1/3)*(1/2) = 1/3
    val p1 = draws.count(z => math.abs(z) == 1L).toDouble / draws.size
    assert(math.abs(p1 - 1.0 / 3.0) < 0.02, s"P(|Z|=1) = $p1")
  }

  test("different salts decorrelate the noise") {
    val a = (0 until 500).map(i => refNoise("dp", s"k$i"))
    val b = (0 until 500).map(i => refNoise("other", s"k$i"))
    assert(a != b)
    val agree = a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(agree < 0.6, s"agreement $agree") // DLap(1/2) collision prob ~ sum p^2 = 0.37... loose bound
  }
}
