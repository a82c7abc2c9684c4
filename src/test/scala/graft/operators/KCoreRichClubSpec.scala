package graft.operators

import graft.SparkSpec

class KCoreRichClubSpec extends SparkSpec {
  import spark.implicits._

  // triangle {1,2,3} with a tail 3–4–5: peeling removes 5 (deg 1), then 4
  // (deg drops to 1), leaving the triangle as the 2-core — coreness
  // (1,2,3)→2, (4,5)→1
  private val trianglePlusTail = Seq(
    (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L))
    .toDF("user_a", "user_b", "n_meetings")

  test("iterated h-index reaches the peeling coreness on triangle+tail") {
    val hist = SpatialOps.kCoreHistogram(trianglePlusTail, rounds = 4)
      .orderBy("coreness").collect()
      .map(r => (r.getAs[Long]("coreness"), r.getAs[Long]("n_users")))
    assert(hist.toSeq == Seq((1L, 2L), (2L, 3L)))
  }

  test("star graph is 1-core everywhere despite the hub's high degree") {
    val star = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L), (0L, 4L, 1L))
      .toDF("user_a", "user_b", "n_meetings")
    val hist = SpatialOps.kCoreHistogram(star, rounds = 4).collect()
    assert(hist.length == 1)
    assert(hist.head.getAs[Long]("coreness") == 1L)
    assert(hist.head.getAs[Long]("n_users") == 5L)
  }

  test("h-index trajectory is already fixed after round 2 on the fixture") {
    // rounds beyond convergence must not change the histogram (the gate
    // pins rounds = 4; this guards the engine-exact convention)
    val h2 = SpatialOps.kCoreHistogram(trianglePlusTail, rounds = 2)
      .orderBy("coreness").collect().toSeq.map(_.toSeq)
    val h6 = SpatialOps.kCoreHistogram(trianglePlusTail, rounds = 6)
      .orderBy("coreness").collect().toSeq.map(_.toSeq)
    assert(h2 == h6)
  }

  test("rich club curve matches the hand computation on triangle+tail") {
    // degrees: 1→2, 2→2, 3→3, 4→2, 5→1; thresholds k=1 and k=2 qualify
    // k=1: nodes {1,2,3,4} (deg>1), induced edges {12,13,23,34} → φ=8/12
    val rows = SpatialOps.richClub(trianglePlusTail)
      .orderBy("k").collect()
    assert(rows.length == 1) // k=2 leaves a single node (3) → filtered
    val r = rows.head
    assert(r.getAs[Long]("k") == 1L)
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(math.abs(r.getAs[Double]("phi") - 2.0 * 4 / (4 * 3)) < 1e-15)
  }

  test("rich club on a clique is density 1 at every reported threshold") {
    val k4 = (for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b, 1L))
      .toDF("user_a", "user_b", "n_meetings")
    val rows = SpatialOps.richClub(k4).collect()
    // all degrees are 3 → the only threshold strictly below is absent;
    // the merged domain is {3} alone with zero nodes above it → filtered
    assert(rows.isEmpty)
    // clique + one pendant: thresholds {1, 3}; k=1 keeps the clique
    val k4p = k4.union(Seq((3L, 9L, 1L)).toDF("user_a", "user_b", "n_meetings"))
    val rs = SpatialOps.richClub(k4p).orderBy("k").collect()
    assert(rs.map(_.getAs[Long]("k")).toSeq == Seq(1L))
    assert(rs.head.getAs[Long]("n_nodes") == 4L)
    assert(rs.head.getAs[Long]("n_edges") == 6L)
    assert(math.abs(rs.head.getAs[Double]("phi") - 1.0) < 1e-15)
  }
}
