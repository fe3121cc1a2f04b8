package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Measures what the containment detector's df≤100 posting prune costs
  * in RECALL (r7 verdict #6): a contained/container pair whose shared
  * shingles are ALL corpus-common is invisible to the pruned index —
  * the oracle cannot see this because both engines apply the identical
  * prune. Dropping grams only lowers intersection counts, so the pruned
  * pair set is a SUBSET of the unpruned ground truth (precision 1.0 by
  * construction); the number that needs measuring is recall. All
  * deterministic (md5 shingle hashes), so the measured recall is an
  * exact repeatable number; SCALE.md §5 records it.
  */
class ContainRecallSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  test("df<=100 prune keeps containment recall vs the unpruned truth (sf0.1)") {
    val d = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val sh = QueriesLlm.shinglesDF(spark, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairs(cap: Int): Set[(Long, Long)] =
      QueriesLlm.containPairs(sh, cap).select("contained", "container")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = pairs(QueriesLlm.MaxBucket)
    val unpruned = pairs(Int.MaxValue)
    sh.unpersist()
    assert(unpruned.nonEmpty, "degenerate corpus: no containment pairs at all")
    val hit = (pruned intersect unpruned).size.toDouble
    val recall = hit / unpruned.size
    info(f"sf0.1: unpruned=${unpruned.size} pruned=${pruned.size} recall=$recall%.4f")
    assert(pruned.subsetOf(unpruned), "prune can only drop pairs, never add")
    assert(recall >= 0.95, f"df prune lost too many containment pairs: $recall%.4f")
  }
}
