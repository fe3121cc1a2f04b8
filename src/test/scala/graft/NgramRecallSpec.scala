package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Measures what the r6 gram sampling (stride 2 + hash mod 4, ~1/8 of the
  * grams) costs in dedup QUALITY. The driver's oracle applies the
  * identical sampling, so its hash parity proves only that both engines
  * compute the same SAMPLED answer — this spec is the only place the
  * sampled pair set is compared against the unsampled ground truth.
  * Everything is deterministic (md5 gram hashes, fixed LCG coefficients),
  * so the measured recall/precision are exact repeatable numbers;
  * SCALE.md §5 records them.
  */
class NgramRecallSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def runAt(d: String): (Set[(Long, Long)], Set[(Long, Long)]) = {
    val sampled = pairs(QueriesLlm.minhashPairs(
      QueriesLlm.ngramsDF(spark, d), 16, 4, 0.8))
    val unsampled = pairs(QueriesLlm.minhashPairs(
      QueriesLlm.ngramsDF(spark, d, stride = 1, sampleMod = 1), 16, 4, 0.8))
    (sampled, unsampled)
  }

  test("sampled char-5-gram dedup keeps >=0.95 recall vs unsampled (sf0.1)") {
    val d = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val (sampled, unsampled) = runAt(d)
    assert(unsampled.nonEmpty, "degenerate corpus: unsampled pipeline found no pairs")
    val hit = (sampled intersect unsampled).size.toDouble
    val recall = hit / unsampled.size
    val precision = if (sampled.isEmpty) 1.0 else hit / sampled.size
    info(f"sf0.1: unsampled=${unsampled.size} sampled=${sampled.size} " +
      f"recall=$recall%.4f precision=$precision%.4f")
    assert(recall >= 0.95, f"sampling lost too many duplicate pairs: recall=$recall%.4f")
  }
}
