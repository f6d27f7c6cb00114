package graft.queries

import graft.SparkSpec

/** Physical-plan regression guards over the whole query inventory.
  * These encode the scale discipline the engine promises: no query may
  * silently regress into an all-pairs join, and the flagship aggregation
  * shapes keep their single-shuffle structure. Planning only — nothing
  * executes. */
class PlanInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  // Deliberate nested-loop users: a broadcast-queries brute-force scorer
  // (the documented small-query-set baseline; candidates never shuffle),
  // the bounded demo pair sweeps built on it, and a5's single-row
  // global-threshold broadcast (a scalar crossJoin, not an all-pairs).
  private val nestedLoopAllowed =
    Set("sim_topk", "sim_neardup_pairs", "dedup_ngram_jaccard",
      "a5_global_threshold")

  test("no query plans a cartesian product or unexpected nested loop") {
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val offenders = names.filter { n =>
      val p = plan(n)
      p.contains("CartesianProduct") ||
        (!nestedLoopAllowed(n) && p.contains("BroadcastNestedLoopJoin"))
    }
    assert(offenders.isEmpty,
      s"all-pairs plans detected: ${offenders.mkString(", ")}")
  }

  test("a2_integrate keeps its one-aggregation-shuffle shape") {
    val exchanges = "Exchange".r.findAllIn(plan("a2_integrate")).length
    // one shuffle for the grouped aggregation + one range exchange for
    // the final orderBy — anything more means the multi-variant
    // integration regressed into multiple passes
    assert(exchanges <= 2, s"a2_integrate plans $exchanges exchanges")
  }

  test("skew_salted_agg is exactly two aggregation stages") {
    val p = plan("skew_salted_agg")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"salted agg plans $exchanges exchanges")
    assert("HashAggregate".r.findAllIn(p).length >= 4,
      "two-stage (partial+final x 2) aggregation shape lost")
  }

  test("a1_ring_outlier broadcasts ring stats back to the fact side") {
    val p = plan("a1_ring_outlier")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "ring-stats join-back no longer broadcasts — fact side would shuffle")
  }
}
