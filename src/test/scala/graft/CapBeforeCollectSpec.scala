package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The r7-verdict buffer finding: bucket caps must bound the aggregation
  * BUFFER, not just the candidate pairs. A collect-then-filter shape
  * materializes a degenerate bucket's full posting list in one
  * aggregation buffer before the size filter drops it (multi-GB at 10^9
  * docs → executor OOM); [[QueriesLlm.cappedIdLists]] pre-counts per key
  * and anti-joins the over-cap keys away BEFORE collect_list, so every
  * buffer is ≤ cap by construction. These tests prove the surviving
  * list/pair sets are IDENTICAL to collect-then-filter (so every oracle
  * stays green) and push a worst-case corpus — one shingle shared by
  * every doc — through the capped dedup paths.
  */
class CapBeforeCollectSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("cappedIdLists emits exactly the collect-then-filter list set") {
    val s = spark
    import s.implicits._
    // 40 small keys of 1-6 ids + one degenerate key holding 5000 ids
    val small = (0 until 40).flatMap(k => (0 to k % 6).map(i => (s"k$k", k * 10L + i)))
    val degen = (0 until 5000).map(i => ("hot", 100000L + i))
    val rows = s.createDataset(small ++ degen).toDF("k", "id").repartition(8)
    val cap = 6
    val reference = rows.groupBy("k")
      .agg(sort_array(collect_list(col("id"))).as("ds"))
      .filter(size(col("ds")).between(2, cap))
    def sets(df: DataFrame): Set[(String, Seq[Long])] =
      df.collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSet
    val capped = QueriesLlm.cappedIdLists(rows, Seq("k"), "id", cap)
    assert(sets(capped) == sets(reference))
    assert(!sets(capped).exists(_._1 == "hot"), "over-cap key survived")
  }

  test("degenerate corpus (one shingle in every doc) flows through the capped minhash path") {
    val s = spark
    import s.implicits._
    // docs 1..100 all carry the IDENTICAL single gram hash: every band
    // bucket is the full corpus (size 100 >> cap) — the buffer hazard.
    // docs 101/102 are genuine near-dups (identical 20-gram sets) whose
    // buckets stay tiny; they must still come out the other end.
    val shared = (1 to 100).map(i => (i.toLong, Array(42L)))
    val dup = Seq(101L, 102L).map(i => (i, (1 to 20).map(g => 1000L + g).toArray))
    val sh = s.createDataset(shared ++ dup).toDF("doc_id", "hs")
    val pairs = QueriesLlm.minhashPairs(sh, 16, 4, 0.8, maxBucket = 4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((101L, 102L)),
      s"capped path must drop the degenerate bucket and keep the true pair: $pairs")
  }
}
