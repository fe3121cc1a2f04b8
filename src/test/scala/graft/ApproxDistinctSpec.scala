package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QueriesRelational

/** the bound check promised by q_agg_approx_distinct (no hash oracle —
  * HLL sketches are approximate; SURVEY.md §2.E)
  */
class ApproxDistinctSpec extends AnyFunSuite {
  test("approx_count_distinct within 5% of exact per group (sf0.001)") {
    val spark = SparkTestSession.spark
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$d/lineitem.parquet").exists())
    val approx = QueriesRelational.queries("q_agg_approx_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = QueriesRelational.queries("q_agg_count_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"group $k: approx $a vs exact $e beyond 5%")
    }
  }

  test("approx_percentile(0.5) within 2% of the exact median per group") {
    val spark = SparkTestSession.spark
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$d/lineitem.parquet").exists())
    import org.apache.spark.sql.functions._
    val approx = QueriesRelational.queries("q_agg_approx_percentile")(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = graft.ops.Tables.t(spark, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) / e <= 0.02,
        s"group $k: approx median $a vs exact $e beyond 2%")
    }
  }
}
