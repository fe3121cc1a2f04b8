package graft.ops

import org.apache.spark.sql.SparkSession

/** Join-strategy probe for the sf10 plan-flip adjudication (r17, VERDICT
  * r16 task 2): prints, for the named board queries at the given
  * SPARK_GRAFT_SF_DIR, the physical join nodes Spark chose (grep
  * "JOINPLAN") plus the formatted plan (grep-bounded dump). The bench
  * session confs are reproduced (AQE on, shuffle.partitions=32) so the
  * probe sees the SAME plan the bench measured; AQE's final plan is
  * forced by executing a cheap count first.
  *
  * Driver-side evidence tool; results land in SCALE.md §6.21 and
  * bench_archive/JOINPLAN_r17_*.txt.
  */
object JoinPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE",
      "q_join_inner,q_join_multiway").split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .appName("join-plan-probe").getOrCreate()
    try names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.count() // run once so AQE finalizes its runtime re-plan
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("BroadcastExchange"))
        .map(_.trim.take(160)).toSeq
      println(s"""JOINPLAN {"query":"$n","dir":"$dir","joins":[""" +
        joins.map(j => "\"" + j.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
          .mkString(",") + "]}")
      println(s"JOINPLAN ---- $n full plan ----")
      plan.linesIterator.take(80).foreach(l => println("JOINPLAN | " + l))
    } finally spark.stop()
  }
}
