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
    // bucket is the full corpus (size 100 >> cap) — the buffer hazard,
    // and a TRUE duplicate mega-cluster (every pair has Jaccard 1.0).
    // docs 101/102 are genuine near-dups (identical 20-gram sets) whose
    // buckets stay tiny; they must still come out the other end.
    //
    // r18 contract (the sf10 recall audit, SCALE.md §6.22): the over-cap
    // bucket TRUNCATES to a per-band cap-subset (bounded clique) plus an
    // md5-rank RING over all members — bounded work, full coverage —
    // instead of vanishing (the r17 drop lost the densest real clusters,
    // exactly the content a 100 TB dedup most needs to catch).
    val shared = (1 to 100).map(i => (i.toLong, Array(42L)))
    val dup = Seq(101L, 102L).map(i => (i, (1 to 20).map(g => 1000L + g).toArray))
    val sh = s.createDataset(shared ++ dup).toDF("doc_id", "hs")
    val cap = 4
    val bands = 4
    val pairs = QueriesLlm.minhashPairs(sh, 16, bands, 0.8, maxBucket = cap)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((101L, 102L)), s"true tiny-bucket pair lost: $pairs")
    // precision: every emitted pair IS a true pair (exact verify)
    assert(pairs.forall { case (a, b) =>
      (a <= 100 && b <= 100) || (a, b) == (101L, 102L) }, s"false pair: $pairs")
    // bounded work: per band at most C(cap,2) clique + (k-1) ring pairs
    val bound = bands * (cap * (cap - 1) / 2 + 99) + 1
    assert(pairs.size <= bound, s"${pairs.size} pairs exceeds the $bound bound")
    // full coverage: the ring keeps every mega-cluster member connected
    val covered = pairs.flatMap(p => Seq(p._1, p._2))
    assert((1L to 100L).forall(covered.contains),
      "a mega-cluster member fell out of the capped path")
  }
}
