package graft.operators

import graft.SparkSpec
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

class SimplifyMinKSpec extends SparkSpec {
  import spark.implicits._

  test("radial simplification matches a sequential reference and keeps anchor invariants") {
    // zig-zag walk: alternating small jitter (~20 m) and big jumps (~600 m)
    val fixes = (0 until 60).map { i =>
      val base = i / 6               // jump every 6 fixes
      val lon = -122.4 + base * 0.008 + (i % 6) * 0.00002
      val lat = 47.6 + (i % 3) * 0.00001
      (1L, i.toLong * 1000000L, i.toLong, lon, lat)
    } ++ (0 until 10).map { i =>     // second user, all within epsilon
      (2L, i.toLong * 1000000L, 100L + i, -122.0 + i * 0.00001, 47.0)
    }
    val df = fixes.toDF("user_id", "t_us", "id", "lon", "lat").repartition(4)
    val got = SpatialOps.simplifyRadial(df, epsilonMeters = 300.0)
      .select("user_id", "k").as[(Long, Long)].collect().toSet

    // sequential reference
    val want = fixes.groupBy(_._1).toSeq.flatMap { case (u, fs) =>
      val sorted = fs.sortBy(f => (f._2, f._3))
      var kept = List(0)
      var a = sorted(0)
      sorted.zipWithIndex.drop(1).foreach { case (f, i) =>
        if (GeoFunctions.haversineMeters(a._4, a._5, f._4, f._5) >= 300.0) {
          kept = i :: kept; a = f
        }
      }
      kept.map(i => (u, i.toLong))
    }.toSet
    assert(got == want)
    assert(got.count(_._1 == 2L) == 1) // jitter-only user collapses to one fix
    assert(got.count(_._1 == 1L) == 10) // first fix + 9 jumps
  }

  test("min-k% prob separates member from non-member probes") {
    val train = (0 until 40).map(i => (100L + i, "the quick brown fox jumps over the lazy dog again and again"))
    val probes = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"), // member (clone)
      (1L, "zzz qqq xxx vvv kkk www uuu yyy ttt rrr sss nnn"))             // non-member
    val df = (probes ++ train).toDF("doc_id", "text")
    val got = TextAnalysis.minKProb(df.filter(col("doc_id") < 50), df.filter(col("doc_id") >= 50),
      kPercent = 25)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val memberMean = got(0L)._2.toDouble / got(0L)._1
    val outsiderMean = got(1L)._2.toDouble / got(1L)._1
    assert(memberMean > outsiderMean,
      s"member min-k mean $memberMean should exceed non-member $outsiderMean")
    // bottom-k size: floor(n * 25 / 100) with the >=1 floor
    val nBigrams = probes.head._2.split(" ").length - 1
    assert(got(0L)._1 == math.max(1, nBigrams * 25 / 100))
  }

  test("min-k% prob of an empty-ish probe emits a zero row, not a missing row") {
    val df = Seq((0L, "solo"), (100L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.minKProb(df.filter(col("doc_id") < 50), df.filter(col("doc_id") >= 50))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 0L))) // single word -> no bigrams -> zeros
  }
}
