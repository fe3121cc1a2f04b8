package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-over-round plan watch for the headline bench set (SCALE.md
  * §6.11): wall time swings ±20-40 % with host/JVM state (the r10
  * winnow false alarm), but the number of exchanges in a plan is
  * deterministic — growth IS a plan regression. Pins the r11 exchange
  * counts; a legitimate plan change updates the pin with a rationale.
  */
class BenchShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def exchanges(name: String): Int = {
    val p = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(p).size
  }

  // (query, max exchanges in the compile-time plan). These are the plans
  // BEFORE AQE runtime re-writes (which only ever removes work); counts
  // include broadcast exchanges. q_events_tumbling_batch lives only in
  // Bench, so its stand-in here is the same events aggregate shape.
  private val pins = Seq(
    "q_agg_groupby" -> 2,            // partial+final agg shuffle, ORDER BY range
    "q_join_inner" -> 3,             // two join inputs + ORDER BY
    "q_join_multiway" -> 11,         // selectivity-first chain (r10 shape);
                                     // compile-time SMJ exchanges — AQE
                                     // demotes most to broadcasts at run
                                     // time (5 shuffle-write stages in the
                                     // r11 runtime audit)
    "q_win_topk_per_group" -> 2,     // window partition + ORDER BY
    "q_fn_json" -> 1                 // per-row projection + final ORDER BY
  )

  for ((q, cap) <- pins)
    test(s"$q plans at most $cap exchanges (bench plan watch)") {
      val n = exchanges(q)
      assert(n <= cap,
        s"$q now plans $n exchanges (pinned max $cap) — a shuffle crept into " +
        "the headline path; check BENCH_LOCAL.json shuffle_audit before and " +
        "after, and only raise the pin with a plan-level justification")
    }
}
