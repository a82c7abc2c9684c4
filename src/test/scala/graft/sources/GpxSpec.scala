package graft.sources

import graft.SparkSpec

import java.nio.file.{Files, Paths}

class GpxSpec extends SparkSpec {
  import spark.implicits._

  test("gpx reader extracts track points across files") {
    val dir = Files.createTempDirectory("graft_gpx").toString
    Files.writeString(Paths.get(dir, "a.gpx"),
      """<?xml version="1.0"?>
        |<gpx><trk><trkseg>
        |<trkpt lat="47.3" lon="8.5"><ele>400</ele><time>2023-01-01T08:00:00Z</time></trkpt>
        |<trkpt lat="47.301" lon="8.501"><time>2023-01-01T08:01:00Z</time></trkpt>
        |</trkseg></trk></gpx>
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "b.gpx"),
      """<gpx><trk><trkseg>
        |<trkpt lon="8.6" lat="47.4"><time>2023-01-02T09:00:00Z</time></trkpt>
        |</trkseg></trk></gpx>
        |""".stripMargin)

    val pfs = Gpx.readPositionfixes(spark, dir, userId = 5L)
    val rows = pfs.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("user_id") == 5L))
    assert(rows(0).getAs[Double]("lat") == 47.3)
    assert(rows(0).getAs[java.sql.Timestamp]("tracked_at") == ts("2023-01-01 08:00:00"))
    // attribute order flips (lon before lat) still parse? file b has lon first
    val b = rows.find(_.getAs[Double]("lon") == 8.6)
    assert(b.isDefined && b.get.getAs[Double]("lat") == 47.4)
  }
}
