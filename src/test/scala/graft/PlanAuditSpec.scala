package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene audit over EVERY registered query: builds each plan (no
  * execution) and rejects join strategies that would be scale accidents —
  * a cartesian or broadcast-nested-loop join that is not on the explicit
  * allowlist of intentional ones. This codifies the README's plan-hygiene
  * claim so a future query can't silently regress into an O(n²) plan.
  */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-plan-audit")
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose nested-loop/cartesian joins are the POINT: the ANN
    * cross joins broadcast the (small) query side; the all-pairs kernel
    * is the shuffle-replicated exact join; q22's scalar-subquery gate is
    * a ONE-row aggregate broadcast against customer. */
  private val intentional = Set(
    "sim_topk", "sim_topk_agg", "sim_lsh_topk", "sim_ivf_topk",
    "sim_near_dup", "sim_kmeans", "sim_ivft", "q22")

  test("no accidental CartesianProduct or BroadcastNestedLoopJoin in any query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !intentional(name) =>
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        if (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"unexpected cartesian/nested-loop joins in: ${offenders.mkString(", ")}")
  }

  test("q7: two-nation filters sit below the fact joins (pushed to the nation scans)") {
    val plan = SparkEntry.queries("q7")(spark, sf).queryExecution.executedPlan.toString
    // The hand-derived single-side conjuncts must reach the parquet scans of
    // BOTH nation roles as pushed In-filters — i.e. below every fact join —
    // rather than surviving only as the residual pair disjunction on top.
    val pushed = "In\\(n_name".r.findAllIn(plan).size
    assert(pushed >= 2,
      s"expected the two-nation In(n_name,…) filter pushed to both nation scans, found $pushed:\n$plan")
  }

  override def afterAll(): Unit = {
    graft.util.ManagedCaches.clearAll(spark)
    spark.stop()
  }
}
