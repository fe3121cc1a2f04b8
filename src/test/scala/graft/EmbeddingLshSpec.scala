package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The banded (multi-table) embedding LSH — the 100 TB config the
  * driver's oracle-default (1 table × 8 planes) rows cannot exercise.
  *
  * Everything here is deterministic: the hyperplanes come from a fixed
  * LCG, so the measured recalls are exact repeatable numbers, asserted
  * as floors (SCALE.md §5 records them). Recall model per pair at angle
  * θ: p = 1-θ/π agreement per plane, table hit p^b, banded hit
  * 1-(1-p^b)^T.
  */
class EmbeddingLshSpec extends AnyFunSuite {
  private val d = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark
  private def emb = graft.ops.Tables.t(spark, d, "embeddings")

  /** brute-force ground truth: every a<b pair with cos >= thr */
  private def brutePairs(thr: Double): Set[(Long, Long)] = {
    val n = emb.select(col("vec_id"), col("embedding"),
      sqrt(aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x)).as("nrm"))
    val dotXY = aggregate(zip_with(col("x.embedding"), col("y.embedding"),
      (p, q) => p.cast("double") * q.cast("double")), lit(0.0), (a, x) => a + x)
    n.as("x").join(n.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(dotXY / (col("x.nrm") * col("y.nrm")), 4).as("cos"))
      .filter(col("cos") >= thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded 8x8 recall beats the single-table oracle default at every threshold") {
    assume(new java.io.File(s"$d/embeddings.parquet").exists())
    for (thr <- Seq(0.35, 0.40, 0.45)) {
      val truth = brutePairs(thr)
      assert(truth.nonEmpty, s"degenerate fixture: no pairs at cos>=$thr")
      val single = pairsOf(QueriesLlm.embCosPairs(emb, 1, 8, 0, thr))
      val banded = pairsOf(QueriesLlm.embCosPairs(emb,
        QueriesLlm.EmbTables, QueriesLlm.EmbPlanesPerTable,
        QueriesLlm.EmbMaxBucket, thr))
      // exact verify makes precision 1.0 in every config
      assert(single.subsetOf(truth)); assert(banded.subsetOf(truth))
      val rs = single.size.toDouble / truth.size
      val rb = banded.size.toDouble / truth.size
      info(f"thr=$thr%.2f truth=${truth.size} single(1x8) recall=$rs%.3f banded(8x8) recall=$rb%.3f")
      assert(banded.size >= single.size,
        s"banded recall $rb below single-table $rs at thr=$thr")
    }
  }

  test("bucket cap bounds candidates and capped output stays a truth subset") {
    assume(new java.io.File(s"$d/embeddings.parquet").exists())
    val nVec = emb.count()
    val cap = 5
    val cand = QueriesLlm.embCandidatePairs(emb,
      QueriesLlm.EmbTables, QueriesLlm.EmbPlanesPerTable, cap).count()
    // each (table, bucket) group of k<=cap docs yields k(k-1)/2 < cap²/2
    // pairs and there are at most N/2 multi-doc buckets per table
    val bound = QueriesLlm.EmbTables.toLong * (nVec / 2 + 1) * cap * (cap - 1) / 2
    assert(cand <= bound, s"candidates $cand exceed the O(N·cap·T) bound $bound")
    val capped = pairsOf(QueriesLlm.embCosPairs(emb,
      QueriesLlm.EmbTables, QueriesLlm.EmbPlanesPerTable, cap, 0.40))
    assert(capped.subsetOf(brutePairs(0.40)))
  }

  test("banded ANN top-k overlaps the exact top-k at least as well as single-table") {
    assume(new java.io.File(s"$d/embeddings.parquet").exists())
    val exact = QueriesLlm.queries("q_llm_simsearch_topk")(spark, d)
      .collect().map(_.getLong(0)).toSet
    def hits(nT: Int, nP: Int): Int =
      QueriesLlm.annTopK(emb, 0, 10, nT, nP)
        .collect().map(_.getLong(0)).toSet.intersect(exact).size
    val hs = hits(1, 8)
    val hb = hits(QueriesLlm.EmbTables, QueriesLlm.EmbPlanesPerTable)
    info(s"top-10 overlap with exact: single(1x8)=$hs banded(8x8)=$hb")
    assert(hb >= hs)
  }

  test("IVF top-k (16 lists, nprobe 4) recalls most of the exact top-k") {
    assume(new java.io.File(s"$d/embeddings.parquet").exists())
    val exact = QueriesLlm.queries("q_llm_simsearch_topk")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val ivf = QueriesLlm.queries("q_llm_simsearch_ivf")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val hit = ivf.intersect(exact).size
    info(s"IVF top-10 overlap with exact top-10: $hit/10")
    // nprobe/K = 1/4 of the corpus scanned; seed (untrained) centroids —
    // the floor documents the recall/cost point, not a tuned optimum
    assert(hit >= 5, s"IVF recall collapsed: $hit/10")
  }
}
