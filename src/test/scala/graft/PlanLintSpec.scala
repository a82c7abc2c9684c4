package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan lint: no registry query may plan a
  * CartesianProduct — the quadratic an innocuous-looking refactor can
  * reintroduce silently (a dropped equi-key, a non-equi join whose
  * broadcast side grew past the threshold). The deliberate all-pairs
  * surfaces (the reference-parity distance matrices, fixture-scale by
  * contract) are whitelisted EXPLICITLY so any new cartesian is a test
  * failure, not a 100 TB incident.
  *
  * Streaming replay gates are skipped: their gate closures EXECUTE the
  * replay during construction (they return a finished, checkpointed
  * frame whose plan is a scan — nothing to lint, at real wall cost).
  */
class PlanLintSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  /** Gates whose all-pairs form is the documented reference-parity
    * contract (each has a banded/bounded scale twin).
    */
  private val deliberateAllPairs = Set(
    "dtw_matrix", "distance_matrix_points")

  test("no registry query plans a CartesianProduct (whitelist: the parity matrices)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) =>
        name.startsWith("streaming_") || deliberateAllPairs.contains(name)
      }
      .flatMap { case (name, q) =>
        val plan = q(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"gate queries planning a CartesianProduct:\n${offenders.mkString("\n")}")
  }
}
