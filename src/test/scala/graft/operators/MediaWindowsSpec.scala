package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("audio energy windows match the closed-form fixture samples exactly") {
    val docs = (0L until 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = Multimodal.audioEnergyWindows(Multimodal.wavFixtures(docs), windowSamples = 128)
      .select("media_id", "window_idx", "n_samples", "energy_q")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    (0L until 5L).foreach { id =>
      val flat = Multimodal.audioFrames(id) * Multimodal.audioChannels(id)
      val windows = (0 until flat).grouped(128).zipWithIndex
      windows.foreach { case (idxs, w) =>
        val energy = idxs.map { i =>
          val s = Multimodal.audioSample(id, i).toLong; s * s
        }.sum
        assert(got((id, w.toLong)) == ((idxs.size.toLong, energy)), s"clip $id window $w")
      }
    }
  }

  test("silence flag is the integer cross-compare, and a silent clip flags every window") {
    // all-zero PCM via a doc id that... fixtures are never zero, so test
    // the threshold arithmetic directly: enormous threshold -> all silent
    val docs = Seq((0L, "x")).toDF("doc_id", "text")
    val loud = Multimodal.audioEnergyWindows(Multimodal.wavFixtures(docs),
      windowSamples = 64, thresholdMeanSquare = 1L)
    assert(loud.filter(col("silent")).count() == 0)
    val quiet = Multimodal.audioEnergyWindows(Multimodal.wavFixtures(docs),
      windowSamples = 64, thresholdMeanSquare = Long.MaxValue / 1000)
    assert(quiet.filter(!col("silent")).count() == 0)
  }

  test("audio clipping counts and peak match a closed-form replay; corrupt blob keeps an audit row") {
    val docs = (0L until 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = Multimodal.audioClipping(Multimodal.wavFixtures(docs), threshold = 32000L)
      .select("media_id", "ok", "n_samples", "n_clipped", "peak")
      .as[(Long, Boolean, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    (0L until 5L).foreach { id =>
      val flat = Multimodal.audioFrames(id) * Multimodal.audioChannels(id)
      val ss = (0 until flat).map(i => math.abs(Multimodal.audioSample(id, i).toLong))
      assert(got(id) == ((true, flat.toLong, ss.count(_ >= 32000L).toLong, ss.max)), s"clip $id")
    }
    // corrupt payload: ok=false row survives, never silently dropped
    val bad = Seq((9L, Array[Byte](1, 2, 3), "audio/wav")).toDF("media_id", "blob", "mime")
    val r = Multimodal.audioClipping(bad).select("media_id", "ok").as[(Long, Boolean)].collect()
    assert(r.toSeq == Seq((9L, false)))
  }

  test("image size filter applies min-edge and aspect rules on real decoded dims") {
    val docs = (0L until 30L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = Multimodal.imageSizeFilter(Multimodal.pngFixtures(docs), minEdge = 6L, maxAspect = 2L)
      .select("media_id", "width", "height", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.length == 30)
    got.foreach { case (id, w, h, keep) =>
      assert(w == Multimodal.fixtureWidth(id).toLong && h == Multimodal.fixtureHeight(id).toLong)
      val expect = math.min(w, h) >= 6L && math.max(w, h) <= 2L * math.min(w, h)
      assert(keep == expect, s"image $id ${w}x$h")
    }
    assert(got.exists(_._4) && got.exists(!_._4)) // both outcomes fire
  }

  test("keyframes keep frame 0 and every frame moving >= the luma threshold") {
    val docs = (0L until 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val media = Multimodal.gifFixtures(docs)
    val kf = Multimodal.keyframes(media, minLumaDelta = 200L)
      .select("media_id", "frame_idx", "luma_delta").as[(Long, Long, Long)].collect()
    val byId = kf.groupBy(_._1)
    byId.foreach { case (_, rows) =>
      assert(rows.exists(_._2 == 0L)) // frame 0 always kept
      rows.filter(_._2 > 0L).foreach(r => assert(r._3 >= 200L))
    }
    // reference: closed-form pixel sums per frame
    (0L until 6L).foreach { id =>
      val w = Multimodal.fixtureWidth(id); val h = Multimodal.fixtureHeight(id)
      val sums = (0 until Multimodal.gifFrames(id)).map { f =>
        (for (x <- 0 until w; y <- 0 until h) yield Multimodal.gifPixel(id, f, x, y).toLong).sum
      }
      val want = sums.indices.filter(f => f == 0 || math.abs(sums(f) - sums(f - 1)) >= 200L)
      val gotFrames = byId(id).map(_._2).sorted.toSeq
      assert(gotFrames == want.map(_.toLong), s"clip $id: $gotFrames vs $want")
    }
  }
}
