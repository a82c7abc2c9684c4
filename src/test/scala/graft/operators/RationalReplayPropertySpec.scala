package graft.operators

import graft.SparkSpec

/** Randomized sequential-replay properties for the round's two
  * rational-arithmetic scorers: seeded random fixtures, a driver-side
  * BigInt re-derivation of the exact integer formulation, and equality
  * on every output column — the same treatment GraphPropertySpec gives
  * the graph operators.
  */
class RationalReplayPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lnq(x: BigInt): Long =
    math.floor(math.log(x.doubleValue) * 1e6).toLong

  test("knScore equals a BigInt replay on random corpora") {
    for (trial <- 1 to 4) {
      val rnd = new scala.util.Random(500 + trial)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val docs = (0L until 30L).map { i =>
        val words = Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        (i, if (i % 2 == 0) "s1" else "s2", words.mkString(" "))
      }
      val got = TextAnalysis.knScore(docs.toDF("doc_id", "source", "text")).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_q"), r.getAs[Long]("n_zero"))))
        .toMap

      // sequential replay
      def bigrams(text: String) = {
        val ws = text.split(" ").filter(_.nonEmpty)
        ws.dropRight(1).zip(ws.drop(1))
      }
      val train = docs.filter(_._1 % 4 != 0)
      val hold = docs.filter(_._1 % 4 == 0)
      val c12 = train.flatMap(d => bigrams(d._3)).groupBy(identity).map { case (k, v) => k -> v.size }
      val c1 = c12.groupBy(_._1._1).map { case (w, g) => w -> g.values.sum }
      val n1f = c12.groupBy(_._1._1).map { case (w, g) => w -> g.size }
      val n1b = c12.groupBy(_._1._2).map { case (w, g) => w -> g.size }
      val d2 = BigInt(c12.size)
      val want = hold.groupBy(_._2).map { case (src, ds) =>
        var n = 0L; var nll = 0L; var zeros = 0L
        for (d <- ds; (w1, w2) <- bigrams(d._3)) {
          n += 1
          val (num, den) =
            if (c1.contains(w1)) {
              val a = BigInt((4 * c12.getOrElse((w1, w2), 0) - 3).max(0)) * d2 +
                BigInt(3) * n1f(w1) * BigInt(n1b.getOrElse(w2, 0))
              (a, BigInt(4) * c1(w1) * d2)
            } else (BigInt(n1b.getOrElse(w2, 0): Int), d2.max(BigInt(1)))
          if (num == 0) zeros += 1
          nll += lnq(den) - lnq(num.max(BigInt(1)))
        }
        src -> ((n, nll, zeros))
      }
      assert(got == want, s"trial $trial")
    }
  }

  test("flowModelCpc equals a BigInt replay on random visit sequences") {
    for (trial <- 1 to 4) {
      val rnd = new scala.util.Random(900 + trial)
      val nLoc = 4
      val coords = (0 until nLoc).map(l => (l * 0.01 + 0.001 * (l % 2), 0.005 * l))
      val visits = for {
        u <- 1L to 8L
        step <- 0 until (3 + rnd.nextInt(5))
      } yield {
        val loc = rnd.nextInt(nLoc)
        (u, u * 100 + step, ts(f"2023-01-01 ${8 + step}%02d:00:00"),
          coords(loc)._1, coords(loc)._2, loc.toLong)
      }
      val df = visits.toDF("user_id", "id", "started_at", "lon", "lat", "location_id")
      val got = Metrics.flowModelCpc(df).collect()
        .map(r => r.getAs[String]("model") ->
          ((r.getAs[Long]("n_pairs"), r.getAs[Long]("cpc_ppm")))).toMap

      // sequential replay of radiationModel + the CPC quantization
      val byUser = visits.groupBy(_._1).view.mapValues(_.sortBy(v => (v._3.getTime, v._2)))
      val flows = byUser.values.flatMap { vs =>
        vs.dropRight(1).zip(vs.drop(1)).map { case (a, b) => (a._6, b._6) }
          .filter { case (f, t) => f != t }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val m = visits.groupBy(_._6).map { case (l, v) => l -> v.size.toLong }
      def cent(l: Long) = {
        val vs = visits.filter(_._6 == l)
        val sx = vs.map(v => math.floor(v._4 * 1e6 + 0.5).toLong).sum
        val sy = vs.map(v => math.floor(v._5 * 1e6 + 0.5).toLong).sum
        (sx.toDouble / vs.size / 1e6, sy.toDouble / vs.size / 1e6)
      }
      def dist(f: Long, t: Long) = {
        val (flon, flat) = cent(f); val (tlon, tlat) = cent(t)
        math.floor(graft.functions.GeoFunctions.haversineMeters(flon, flat, tlon, tlat)).toLong
      }
      val pairs = flows.keys.toSeq.sortBy(identity)
      val weights = pairs.map { case (f, t) =>
        val d = dist(f, t)
        val s = m.keys.filter(k => k != f && k != t && dist(f, k) < d)
          .map(m).sum
        val wRad = (BigInt(1000000) * m(f) * m(t)) /
          ((BigInt(m(f)) + s) * (BigInt(m(f)) + m(t) + s))
        val dc = math.max(d, 1L)
        val wGrav = (BigInt("1000000000000") * m(f) * m(t)) / (BigInt(dc) * dc)
        (f, t) -> ((wRad, wGrav))
      }.toMap
      def cpc(pick: ((BigInt, BigInt)) => BigInt): (Long, Long) = {
        val byOrigin = pairs.groupBy(_._1)
        var sMin = BigInt(0); var sPred = BigInt(0); var sObs = BigInt(0)
        for ((_, ps) <- byOrigin) {
          val sw = ps.map(p => pick(weights(p))).sum
          val oi = ps.map(flows).sum
          for (p <- ps) {
            val obsU = BigInt(flows(p)) * 1000000
            val predU = if (sw == 0) BigInt(0) else BigInt(oi) * 1000000 * pick(weights(p)) / sw
            sMin += predU.min(obsU); sPred += predU; sObs += obsU
          }
        }
        (pairs.size.toLong, (BigInt(2000000) * sMin / (sPred + sObs)).toLong)
      }
      assert(got("radiation") == cpc(_._1), s"trial $trial radiation")
      assert(got("gravity2") == cpc(_._2), s"trial $trial gravity2")
    }
  }
}
