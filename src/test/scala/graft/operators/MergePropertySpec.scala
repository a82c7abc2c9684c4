package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property test: the single-pass run-grouping in StaypointMerger is
  * equivalent to the reference's iterative merge semantics, checked
  * against a straightforward sequential reference implementation over
  * random (seeded) staypoint sequences.
  */
object MergePropertySpec {
  final case class Sp(id: Long, user: Long, sUs: Long, fUs: Long, loc: Long)
}

class MergePropertySpec extends SparkSpec {
  import MergePropertySpec.Sp
  import spark.implicits._

  /** Sequential reference merge: walk time-sorted rows per user; merge a
    * row into the current run iff same loc and gap <= maxGap (exactly
    * the reference's consecutive-transitive semantics).
    */
  private def refMerge(rows: Seq[Sp], maxGapUs: Long): Seq[(Long, Long, Long, Long, Long)] = {
    rows.groupBy(_.user).toSeq.flatMap { case (_, us) =>
      val sorted = us.sortBy(s => (s.sUs, s.id))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      for (s <- sorted) {
        out.lastOption match {
          case Some((id0, u0, s0, f0, l0))
            if l0 == s.loc && s.sUs - f0 <= maxGapUs =>
            out(out.length - 1) = (id0, u0, s0, s.fUs, l0) // last row's finish
          case _ =>
            out += ((s.id, s.user, s.sUs, s.fUs, s.loc))
        }
      }
      out.toSeq
    }
  }

  private val genUserRows: Gen[Seq[Sp]] = for {
    n <- Gen.choose(0, 25)
    user <- Gen.choose(0L, 2L)
    rows <- Gen.sequence[Seq[Sp], Sp]((0 until n).map { i =>
      for {
        gap <- Gen.choose(0L, 30L * 60e6.toLong) // 0..30 min between staypoints
        dur <- Gen.choose(1L, 60L * 60e6.toLong)
        loc <- Gen.choose(0L, 3L)
      } yield Sp(i.toLong, user, 0L, dur, loc) // sUs fixed up below
    })
  } yield {
    // stack rows sequentially in time with the generated gaps
    var t = 1600000000000000L
    rows.zipWithIndex.map { case (r, i) =>
      val s = t + (i + 1) * 7L * 60e6.toLong // spacing varies with index
      val res = r.copy(sUs = s, fUs = s + r.fUs)
      t = s
      res
    }
  }

  test("run-grouping merge equals sequential reference merge on random inputs") {
    var seed = org.scalacheck.rng.Seed(42L)
    var checked = 0
    while (checked < 15) {
      val rows = genUserRows.apply(Gen.Parameters.default, seed).getOrElse(Seq.empty)
      seed = seed.next
      if (rows.nonEmpty) {
        checked += 1
        val df = rows.toDF()
          .select(col("id"), col("user").as("user_id"),
            timestamp_micros(col("sUs")).as("started_at"),
            timestamp_micros(col("fUs")).as("finished_at"),
            col("loc").as("location_id"))
        val empty = df.filter(lit(false)).select(col("id"), col("user_id"), col("started_at"))
        val got = StaypointMerger.mergeStaypoints(df, empty, maxTimeGapMinutes = 10)
          .select(col("id"), col("user_id"), unix_micros(col("started_at")),
            unix_micros(col("finished_at")), col("location_id"))
          .as[(Long, Long, Long, Long, Long)].collect().toSet
        val want = refMerge(rows, 10L * 60e6.toLong).toSet
        assert(got == want, s"mismatch for rows: $rows")
      }
    }
  }
}
