package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan lint: no registry query may plan an
  * UNBOUNDED quadratic join — a CartesianProduct, or a
  * BroadcastNestedLoopJoin whose build side scales with the data (a
  * dropped equi-key, a non-equi join whose small side fits the
  * broadcast threshold at test scale and won't at 100 TB). The
  * deliberate all-pairs surfaces (the reference-parity distance
  * matrices, fixture-scale by contract, and the zone-pair mobility
  * models whose zones² pairing is the documented contract) are
  * whitelisted EXPLICITLY so any new quadratic is a test failure, not
  * a 100 TB incident.
  *
  * A BNLJ is NOT flagged when its build side is provably bounded —
  * an ungrouped aggregate (≤1 row: the `crossJoin(broadcast(totals))`
  * enrichment idiom all the *_fit / *_drift / tf-idf gates use), a
  * limit/top-k, or a small driver-local relation (≤4096 rows: literal
  * query sets, neighbor-offset tables). Those are map-side enrichments
  * whose build volume is O(1) in the input, not hidden quadratics.
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
    "dtw_matrix", "frechet_matrix", "hausdorff_matrix",
    "distance_matrix_points", "distance_matrix_xy")

  /** Gates whose quadratic operates on an AGGREGATED zone table orders
    * smaller than the input, where the pairing is the model's inherent
    * cost (documented, with a banded escape hatch):
    *  - radiation_flows: zones² with the s_ij prefix sum (Simini et
    *    al. 2012; radiationFlowsRinged is the bounded equi-join twin)
    *  - od_gravity_fit / od_radiation: same zone-pair space for the
    *    deterrence regression / model comparison
    *  - flow_model_cpc: scores od_radiation's pair table — inherits the
    *    identical zones² s_ij join, nothing new is quadratic
    */
  private val deliberateZonePairs = Set(
    "radiation_flows", "od_gravity_fit", "od_radiation", "flow_model_cpc",
    // the one documented-unbandable distance-join shape: FULL OUTER
    // keeps its BNLJ by design (either side's explode would duplicate
    // its unmatched rows), but the rule attaches the keyless per-task
    // PairBudgetGuard, so the quadratic is runtime-loud rather than
    // plan-visible-bounded; DistanceJoinRuleSpec pins both the guard's
    // presence and its raise
    "spatial_join_full")

  /** Gates whose BNLJ build side is a FIXED literal-id probe set
    * (vec_id < 10/100, or the ivf centroid seeds at vec_id < nlist) —
    * bounded by contract but invisible to the plan. A structural
    * `.limit` would make the bound plan-visible, but costs a measured
    * ~0.5 s GlobalLimit exchange per gate (LimitProbe, r12), so these
    * are whitelisted by name; the probes×corpus loop join is the
    * documented brute-force/assignment baseline, O(probes·corpus) with
    * probes O(1) in the input.
    */
  private val boundedProbes = Set(
    "ann_bruteforce", "ann_dim_ablation", "ann_filtered", "ann_ivf",
    "ann_ndcg", "ann_pq", "ann_recall", "hard_negatives", "hybrid_rrf",
    "intrinsic_dim", "knn_confusion", "pq_recall")

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Build side provably bounded — a DOMINATING-node recursion, not a
    * subtree grep (a limit buried under one input of a join must not
    * bless the join): the root is a limit / ungrouped aggregate / small
    * local relation, or a row-count-preserving unary above a bounded
    * child, or an aggregate/join/union of bounded inputs (grouped aggs
    * emit ≤ input rows; a join emits ≤ |L|·|R|). ReusedExchange
    * recurses into the exchange it reuses instead of being trusted
    * blindly. Row-multiplying unaries (Generate/flatMap shapes) fall to
    * the default false.
    */
  private val rowPreservingUnary = Set(
    "ProjectExec", "FilterExec", "SortExec", "CoalesceExec",
    "WholeStageCodegenExec", "InputAdapter", "BroadcastExchangeExec",
    "ShuffleExchangeExec", "AQEShuffleReadExec", "ColumnarToRowExec",
    "RowToColumnarExec", "ExpandExec", "WindowExec", "WindowGroupLimitExec",
    "SerializeFromObjectExec", "DeserializeToObjectExec", "MapElementsExec")

  private def bounded(p: SparkPlan): Boolean = p match {
    case _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
    case h: HashAggregateExec => h.groupingExpressions.isEmpty || bounded(h.child)
    case s: SortAggregateExec => s.groupingExpressions.isEmpty || bounded(s.child)
    case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty || bounded(o.child)
    case l: LocalTableScanExec => l.rows.lengthCompare(4097) < 0
    case r: ReusedExchangeExec => bounded(r.child)
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      bounded(j.left) && bounded(j.right)
    case u if u.getClass.getSimpleName == "UnionExec" => u.children.forall(bounded)
    case _: LocalLimitExec => bounded(p.children.head)
    case u if u.children.size == 1 && rowPreservingUnary(u.getClass.getSimpleName) =>
      bounded(u.children.head)
    case _ => false
  }

  test("no registry query plans an unbounded quadratic join " +
    "(whitelist: parity matrices + zone-pair models)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) =>
        name.startsWith("streaming_") || deliberateAllPairs.contains(name)
      }
      .flatMap { case (name, q) =>
        val plan = unwrap(q(spark, dir).queryExecution.executedPlan)
        val cartesian = plan.collect { case c: CartesianProductExec => c }.nonEmpty
        val badBnlj = !deliberateZonePairs.contains(name) &&
          !boundedProbes.contains(name) &&
          plan.collect { case b: BroadcastNestedLoopJoinExec => b }.exists { b =>
            val build = b.buildSide match {
              case BuildLeft => b.left
              case BuildRight => b.right
            }
            !bounded(build)
          }
        if (cartesian || badBnlj)
          Some(s"$name (${if (cartesian) "CartesianProduct" else "unbounded BroadcastNestedLoopJoin"})")
        else None
      }
    assert(offenders.isEmpty,
      s"gate queries planning a quadratic join:\n${offenders.mkString("\n")}")
  }
}
