package graft.functions

import graft.SparkSpec
import graft.operators.CorpusOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-8 key kernels: Morton interleave
  * bijectivity, geohash vs the bisection reference, CDC losslessness,
  * and UniMax allocation invariants — all over seeded random inputs.
  */
class KeyKernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default

  test("morton interleave is a bijection: deinterleave recovers both coordinates (200 cases)") {
    val gen = for {
      x <- Gen.choose(0L, ZOrder.Max)
      y <- Gen.choose(0L, ZOrder.Max)
    } yield (x, y)
    val pairs = (0 until 200).map(i => gen.pureApply(params, Seed(i.toLong)))
    val keys = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    keys.foreach { case (x, y, z) =>
      // local deinterleave: collect even/odd bits
      var (rx, ry) = (0L, 0L)
      (0 until ZOrder.Bits).foreach { i =>
        rx |= ((z >> (2 * i)) & 1L) << i
        ry |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert((rx, ry) == ((x, y)), s"z=$z")
    }
    assert(keys.map(_._3).distinct.length == keys.length) // injective on the sample
  }

  test("geohash matches the bisection reference on random coordinates (200 cases)") {
    def refGeohash(lon: Double, lat: Double, precision: Int): String =
      GeohashReference.encode(lon, lat, precision)
    val gen = for {
      lon <- Gen.choose(-179.9999, 179.9999)
      lat <- Gen.choose(-89.9999, 89.9999)
    } yield (lon, lat)
    val coords = (0 until 200).map(i => gen.pureApply(params, Seed(1000L + i)))
    val got = coords.toDF("lon", "lat")
      .select(Geohash.encode(col("lon"), col("lat"), 6).as("g")).as[String].collect().toSeq
    coords.zip(got).foreach { case ((lon, lat), g) =>
      assert(g == refGeohash(lon, lat, 6), s"($lon, $lat)")
    }
  }

  test("cdc chunking is lossless and order-preserving on random docs (60 cases)") {
    val gen = for {
      n <- Gen.choose(1, 120)
      ws <- Gen.listOfN(n, Gen.choose(0, 30).map(k => s"w$k"))
    } yield ws
    (0 until 60).foreach { i =>
      val ws = gen.pureApply(params, Seed(2000L + i))
      val text = ws.mkString(" ")
      val chunks = CorpusOps.cdcChunks(Seq((0L, text)).toDF("doc_id", "text"), k = 2, maskBits = 3)
        .orderBy("chunk_index")
        .select("chunk_index", "n_tokens", "chunk_text").as[(Long, Long, String)].collect().toSeq
      assert(chunks.map(_._3).mkString(" ") == text, s"seed $i")
      assert(chunks.map(_._1) == chunks.indices.map(_.toLong), s"seed $i dense ids")
      chunks.foreach(c => assert(c._2 == c._3.split(" ").length, s"seed $i n_tokens"))
    }
  }

  test("unimax allocation invariants hold on random size/budget mixes (60 cases)") {
    val gen = for {
      k <- Gen.choose(1, 12)
      sizes <- Gen.listOfN(k, Gen.choose(1, 300))
      budget <- Gen.choose(1L, 3000L)
      cap <- Gen.choose(1, 4)
    } yield (sizes, budget, cap)
    (0 until 60).foreach { i =>
      val (sizes, budget, cap) = gen.pureApply(params, Seed(3000L + i))
      val docs = sizes.zipWithIndex
        .map { case (n, j) => (s"s$j", Seq.fill(n)("w").mkString(" ")) }
        .toDF("source", "text")
      val rows = CorpusOps.unimaxAllocation(docs, budget, cap)
        .select("cap", "allocated", "capped").as[(Long, Long, Boolean)].collect().toSeq
      val total = rows.map(_._2).sum
      val capSum = rows.map(_._1).sum
      assert(total == math.min(budget, capSum), s"seed $i: total $total vs min($budget, $capSum)")
      rows.foreach { case (c, a, isCapped) =>
        assert(a >= 0 && a <= c, s"seed $i: alloc $a outside [0, $c]")
        if (isCapped) assert(a == c, s"seed $i: capped but alloc $a != cap $c")
      }
      val un = rows.filter(!_._3).map(_._2)
      if (un.nonEmpty) assert(un.max - un.min <= 1, s"seed $i: water level spread ${un}")
    }
  }
}
