package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.J: the user-extensibility surface. The reference inherits
  * DuckDB's UDF registration because its ctor accepts a user connection
  * (ducklakexl.py:21,77-80); the Spark-native counterparts are:
  *   - scalar UDF  (q_udf_scalar)   — `udf(...)`, registered per session
  *   - typed UDAF  (q_udaf_typed)   — `Aggregator[IN,BUF,OUT]` via `udaf(...)`
  *   - "UDTF"      (q_udtf_explode) — Catalyst `Generator` via posexplode
  *
  * Scale note: a JVM scalar UDF breaks whole-stage codegen for its operator
  * but stays in-process (no Python worker round-trip); the Aggregator runs
  * as a partial-then-final aggregate, so the shuffle carries one small
  * buffer per group, not rows — the same map-side-combine shape as built-in
  * aggregates. That is the 100 TB-safe way to ship custom aggregation.
  */
object QueriesUdf {
  type QFn = (SparkSession, String) => DataFrame

  /** Geometric mean = exp(avg(ln x)), as a typed Aggregator. The buffer is
    * (sum of logs, count) — constant size, mergeable, spill-friendly.
    */
  case class GeoMeanBuf(var sumLn: Double, var n: Long)
  object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
    def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
    def reduce(b: GeoMeanBuf, a: Double): GeoMeanBuf = {
      b.sumLn += math.log(a); b.n += 1; b
    }
    def merge(b1: GeoMeanBuf, b2: GeoMeanBuf): GeoMeanBuf =
      GeoMeanBuf(b1.sumLn + b2.sumLn, b1.n + b2.n)
    def finish(b: GeoMeanBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
    def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, QFn] = Map(
    "q_udf_scalar" -> { (s, d) =>
      // string normalizer UDF: trim -> lowercase -> strip non-alnum
      val norm = udf((x: String) =>
        if (x == null) null
        else x.trim.toLowerCase.replaceAll("[^a-z0-9 ]", ""))
      Tables.t(s, d, "customer").select(
        col("c_custkey"),
        norm(col("c_name")).as("norm_name"),
        norm(concat(col("c_mktsegment"), lit("  "))).as("norm_seg")
      ).orderBy("c_custkey")
    },

    "q_udaf_typed" -> { (s, d) =>
      val geoMean = udaf(GeoMean)
      Tables.t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(geoMean(col("l_quantity")), 4).as("geo_qty"),
             count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    "q_udtf_explode" -> { (s, d) =>
      // table function: 1 document row -> N (pos, word) rows via the
      // built-in Generator (posexplode); 1-based pos to match the oracle
      Tables.t(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("word"))
        .filter(col("doc_id") < 100)
        .orderBy("doc_id", "pos")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_udf_scalar" ->
      ("SELECT c_custkey, " +
       "regexp_replace(lower(trim(c_name)), '[^a-z0-9 ]', '', 'g') AS norm_name, " +
       "regexp_replace(lower(trim(concat(c_mktsegment, '  '))), '[^a-z0-9 ]', '', 'g') AS norm_seg " +
       "FROM customer ORDER BY c_custkey"),
    "q_udaf_typed" ->
      ("SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 4) AS geo_qty, " +
       "COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_udtf_explode" ->
      ("SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, unnest(ws) AS word " +
       "FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 100) " +
       "ORDER BY doc_id, pos")
  )
}
