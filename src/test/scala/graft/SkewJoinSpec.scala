package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Two-path skew mitigation must be invisible in results. The driver's
  * oracle only exercises the cold path at bench scale (no key exceeds a
  * production hotThreshold), so this spec drives the SAME code with a
  * tiny threshold — making real keys hot — and compares both-path output
  * against the plain join.
  */
class SkewJoinSpec extends AnyFunSuite {
  private val d = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark

  private def plainJoin() = {
    val l = Tables.t(spark, d, "lineitem")
    val o = Tables.t(spark, d, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
      .orderBy("o_orderpriority")
      .collect().toSeq
  }

  test("hot+cold two-path output equals the plain join (threshold 2: real hot keys)") {
    assume(new java.io.File(s"$d/lineitem.parquet").exists())
    val l = Tables.t(spark, d, "lineitem")
    val nHot = l.groupBy("l_orderkey").count().filter(col("count") > 2).count()
    assert(nHot > 0, "fixture has no key with >2 lines; threshold too high to exercise the hot path")
    val mitigated = QueriesRelational.skewSaltedJoin(spark, d, hotThreshold = 2L,
      sampleShift = 0).collect().toSeq
    assert(mitigated == plainJoin(), "salting changed the result")
  }

  test("sampled hot detection still equals the plain join (both paths live)") {
    assume(new java.io.File(s"$d/lineitem.parquet").exists())
    // rate 2, cut = 1: enough fixture keys get >=2 sampled rows that BOTH
    // paths carry real data — and the result must be unchanged regardless
    // of which keys the sample promotes to the hot set
    val mitigated = QueriesRelational.skewSaltedJoin(spark, d, hotThreshold = 2L,
      sampleShift = 1).collect().toSeq
    assert(mitigated == plainJoin(), "sampled hot set changed the result")
  }

  test("production threshold: hot set empty, still equals the plain join") {
    assume(new java.io.File(s"$d/lineitem.parquet").exists())
    val mitigated = QueriesRelational.skewSaltedJoin(spark, d, hotThreshold = 1L << 20)
      .collect().toSeq
    assert(mitigated == plainJoin())
  }
}
