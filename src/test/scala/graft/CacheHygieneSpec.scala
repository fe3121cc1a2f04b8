package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QueriesLlm

/** r3 verdict #2/#8: the LSH dedup operators persist corpus-scale
  * intermediates (shingles, signatures, CC edges/labels); a long-lived
  * user session must get them RELEASED by the operator itself, not by a
  * harness calling clearCache. Each operator now eagerly materializes its
  * output-sized result (localCheckpoint) and unpersists the inputs before
  * returning — so after a call, the Dataset cache registry is empty. (The
  * checkpointed result blocks are output-sized and reclaimed by the
  * ContextCleaner once the caller drops the DataFrame; they never hold
  * corpus-scale data.)
  */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  for (q <- Seq("q_llm_dedup_near", "q_llm_dedup_ngram",
                "q_llm_dedup_simhash", "q_llm_dedup_cluster",
                "q_llm_dedup_contain", "q_llm_dedup_embcos")) {
    test(s"$q releases its corpus-scale caches at the source") {
      spark.sharedState.cacheManager.clearCache()
      val df = QueriesLlm.queries(q)(spark, sf)
      assert(df.count() >= 0L)
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$q left Dataset cache entries registered after returning")
    }
  }
}
