package graft

import org.apache.spark.sql.SparkSession

/** prints formatted physical plans for the headline + LLM queries so plan
  * regressions (lost pushdown, missed broadcast, codegen breaks) are
  * visible. tools-only; not part of the library surface.
  * usage: sbt "runMain graft.PlanAudit [sfDir] [query...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "q_scan_filter_pushdown", "q_scan_projection_pushdown",
      "q_agg_groupby", "q_join_inner", "q_join_multiway",
      "q_win_topk_per_group", "q_topk", "q_sort_multikey",
      "q_llm_dedup_near", "q_llm_simsearch_topk", "q_llm_simsearch_ivf",
      "q_llm_fingerprint_winnow", "q_llm_repetition", "q_fn_json")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
