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
    "q_join_multiway" -> 10,         // selectivity-first chain; r19 joins
                                     // the region-pruned customers into
                                     // orders BEFORE the lineitem spine —
                                     // AQE demotes the pruned spine to
                                     // broadcast at run time (3 shuffle
                                     // stages / 6 KB written, r19 audit)
    "q_win_topk_per_group" -> 2,     // window partition + ORDER BY
    "q_fn_json" -> 1,                // per-row projection + final ORDER BY
    // r12 (r11 verdict #3): the most expensive LLM-pipeline queries plus
    // the four r11 wall-time movers join the audited set — Bench now
    // records their shuffle bytes per round, and these compile-time
    // exchange counts make a plan regression fail `sbt test` directly.
    // 0-exchange pins are the strongest claims: those pipelines are
    // single-pass / broadcast-only by design (SCALE.md) and must stay so.
    "q_llm_pipeline_e2e" -> 6,       // r19: was 17 — window exact-keep +
                                     // checkpointed survivor set + window
                                     // canonical verdict
    "q_llm_dedup_incremental" -> 4,  // r19: was 7 — exact check is a
                                     // window count over the nh partition
    "q_llm_dedup_contain" -> 0,      // df-pruned posting join, broadcast
    "q_llm_dedup_cluster" -> 1,      // LSH buckets + local union-find
    "q_llm_dedup_keep_best" -> 3,    // r19: was 5 — one label window
                                     // instead of argmax agg + join-back
    "q_llm_split_leakfree" -> 3,     // leak-free split via group ranking
    "q_llm_segment_dedup" -> 5,      // r20: was 4 — the skew-safe df shape
                                     // (VERDICT r19 item 3) trades the
                                     // hot-key `sum over (partition by
                                     // seg)` window for distinct + map-
                                     // side-combined count + dup-table
                                     // join-back; the 5th compile-time
                                     // exchange is the join's probe side,
                                     // which AQE elides at runtime by
                                     // broadcasting the tiny dup table
                                     // (runtime audit r20: shuffle-write
                                     // stages did not grow vs r19)
    "q_llm_source_overlap" -> 3,     // gram-set overlap join
    "q_llm_dedup_embcos_banded" -> 0, // banded plane-bucket self-join
    "q_llm_copy_detect" -> 3,        // winnow fingerprints + pair join
    "q_llm_dedup_embcos" -> 0,       // plane-bucket self-join (broadcast)
    "q_llm_dedup_embcluster" -> 1,   // bucketed centroid assignment
    "q_fn_bitwise" -> 1              // projection + final ORDER BY
  )

  for ((q, cap) <- pins)
    test(s"$q plans at most $cap exchanges (bench plan watch)") {
      val n = exchanges(q)
      info(s"$q plans $n exchanges (pin $cap)")
      assert(n <= cap,
        s"$q now plans $n exchanges (pinned max $cap) — a shuffle crept into " +
        "the headline path; check BENCH_LOCAL.json shuffle_audit before and " +
        "after, and only raise the pin with a plan-level justification")
    }
}
