package graft.sources

import graft.SparkSpec
import graft.operators.{StaypointGenerator, TriplegGenerator}
import org.apache.spark.sql.functions._

/** Golden-fixture parity for the Geolife mode-label pipeline against the
  * reference's OWN bundled public fixture
  * (/root/reference/tests/data/geolife_modes — users 010/020 with
  * labels.txt, user 178 without), mirroring the reference's fixture
  * chain read_geolife → generate_staypoints(sliding, dist=25, time=5) →
  * generate_triplegs(between_staypoints) → geolife_add_modes_to_triplegs
  * (tests/io/test_dataset_reader.py:15-25,192-214; label semantics at
  * io/dataset_reader.py:197-300).
  *
  * Reader-level counts are INDEPENDENTLY derivable from the raw files
  * (plt line counts minus the 6-line header; labels.txt minus its
  * header) — those are hard goldens. The pipeline-level mode
  * distribution is the engine's own pinned output (a stability golden:
  * the operators are DuckDB-oracle-gated elsewhere; this pins that the
  * end-to-end fixture chain keeps producing exactly it).
  */
class GeolifeFixtureSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/tests/data/geolife_modes"

  private def fixtureExists: Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(fixtureDir))

  test("reader parity on the reference fixture: users, per-user counts, label counts") {
    assume(fixtureExists, s"reference fixture not present at $fixtureDir")
    val pfs = Geolife.readPositionfixes(spark, fixtureDir)
    val perUser = pfs.groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    // raw plt line counts minus 6 header lines per file (independently
    // computed from the fixture): 010 -> 3418, 020 -> 715, 178 -> 84
    assert(perUser === Map(10L -> 3418L, 20L -> 715L, 178L -> 84L))
    // ids are dense 0..n-1 (the reference's reset_index contract)
    assert(pfs.agg(min("id"), max("id"), count(lit(1))).first() match {
      case r => r.getLong(0) == 0L && r.getLong(1) == r.getLong(2) - 1
    })

    val labels = Geolife.readLabels(spark, fixtureDir)
    val labelsPerUser = labels.groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    // labels.txt line counts minus the header: 010 -> 434, 020 -> 223;
    // user 178 has no labels.txt (the dict-of-users contract,
    // test_dataset_reader.py:106-113)
    assert(labelsPerUser === Map(10L -> 434L, 20L -> 223L))
  }

  test("mode-label pipeline golden on the reference fixture") {
    assume(fixtureExists, s"reference fixture not present at $fixtureDir")
    val pfs = Geolife.readPositionfixes(spark, fixtureDir)
    val labels = Geolife.readLabels(spark, fixtureDir)
    // the reference fixture chain's parameters
    // (test_dataset_reader.py:22-23): sliding, dist 25 m, time 5 min
    val (pfsSp, _) = StaypointGenerator.generate(pfs,
      StaypointGenerator.Params(distThresholdMeters = 25, timeThresholdMinutes = 5))
    val (_, tpls) = TriplegGenerator.generate(pfsSp)
    val labelled = Geolife.addModesToTriplegs(tpls, labels)

    // reference invariants (test_geolife_mode_matching / test_no_overlap):
    // row-for-row with the input triplegs, unique ids, no duplicated
    // (started_at, finished_at), both labeled and unlabeled rows exist
    assert(labelled.count() === tpls.count())
    assert(labelled.select("id").distinct().count() === labelled.count())
    assert(labelled.select("started_at", "finished_at").distinct().count()
      === labelled.count())
    val withMode = labelled.filter(col("mode").isNotNull).count()
    assert(withMode > 0 && withMode < labelled.count(),
      s"expected a mix of labeled/unlabeled triplegs, got $withMode of ${labelled.count()}")

    // pinned golden: the exact per-mode tripleg counts this fixture
    // chain produces (stability golden — regenerate deliberately if the
    // staypoint/tripleg/interval-join semantics change on purpose)
    val modeCounts = labelled.filter(col("mode").isNotNull)
      .groupBy("mode").count().collect()
      .map(r => r.getAs[String]("mode") -> r.getAs[Long]("count")).toMap
    val golden = Map("bike" -> 2L, "bus" -> 1L, "taxi" -> 2L, "train" -> 34L, "walk" -> 4L)
    assert(modeCounts === golden, s"actual mode counts: ${modeCounts.toSeq.sortBy(_._1)}")
  }
}
