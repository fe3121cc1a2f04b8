package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** r14 VERDICT item 8: the LLM sketch hash family is a tested config —
  * `spark.graft.llm.hashFamily = md5 | xxhash64`. md5 (default) keeps the
  * engine-portable oracle hash-parity; xxhash64 is the family one flips
  * on at 100 TB (~10x cheaper per hashed byte). This spec proves what the
  * flag must NOT change: the pipeline SHAPE (same plan exchanges, same
  * schema, same banding/caps machinery) and the dedup SEMANTICS that are
  * family-independent (identical text hashes identically in any family,
  * so exact duplicates still collide into the same LSH buckets and score
  * jaccard 1.0).
  */
class HashFamilySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"
  private val Flag = "spark.graft.llm.hashFamily"

  private def withFamily[A](fam: String)(body: => A): A = {
    spark.conf.set(Flag, fam)
    try body finally spark.conf.unset(Flag)
  }

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, d)

  test("xxhash64 mode keeps plan shape and schema on the sketch queries") {
    for (q <- Seq("q_llm_dedup_near", "q_llm_dedup_ngram", "q_llm_dedup_simhash")) {
      val md5Plan = run(q).queryExecution.executedPlan.toString
      val (xxPlan, xxSchema) = withFamily("xxhash64") {
        val df = run(q)
        (df.queryExecution.executedPlan.toString, df.schema)
      }
      def exch(p: String) = "Exchange".r.findAllIn(p).size
      assert(exch(md5Plan) == exch(xxPlan),
        s"$q: exchange count changed under xxhash64")
      assert(run(q).schema == xxSchema, s"$q: schema changed under xxhash64")
    }
  }

  test("near-dup pairs and verified jaccard are family-independent") {
    // the VERIFIED jaccard of a pair is computed over the shingle-hash
    // SETS, whose set-relations are identical in any (collision-free)
    // family; only LSH BUCKETING can differ at the margin. At sf0.001
    // both families must recover (near-)identical pair sets with
    // IDENTICAL verified scores on the overlap.
    val md5Pairs = run("q_llm_dedup_near").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val xxPairs = withFamily("xxhash64")(run("q_llm_dedup_near").collect())
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(md5Pairs.nonEmpty && xxPairs.nonEmpty)
    val common = md5Pairs.keySet intersect xxPairs.keySet
    assert(common.size * 10 >= md5Pairs.size * 9,
      s"xxhash64 recovered ${common.size}/${md5Pairs.size} of the md5 pairs")
    assert(common.forall(k => md5Pairs(k) == xxPairs(k)),
      "verified jaccard diverged between families on a common pair")
    assert(xxPairs.values.forall(v => v >= 0.0 && v <= 1.0))
    // md5 result reproduced once the flag is unset (no global leakage)
    assert(run("q_llm_dedup_near").count().toInt == md5Pairs.size)
  }

  test("sketch expressions carry the family (serialized, not JVM-global)") {
    import org.apache.spark.sql.functions._
    val one = spark.range(1).select(
      lit("alpha beta gamma delta epsilon zeta eta theta").as("nt"))
    val md5Sh = one.select(
      graft.functions.TextSketch.hashedWordShinglesCol(col("nt"), 5).as("hs"))
      .head().getSeq[Long](0)
    val xxSh = one.select(
      graft.functions.TextSketch.hashedWordShinglesCol(col("nt"), 5, xx = true)
        .as("hs")).head().getSeq[Long](0)
    assert(md5Sh.length == xxSh.length, "shingle COUNT is family-independent")
    assert(md5Sh != xxSh, "families must produce different hash values")
    assert(xxSh.forall(h => h >= 0L && h < (1L << 60)), "60-bit shape kept")
    val xxSig = one.select(
      graft.functions.TextSketch.simhashSigCol(col("nt"), xx = true).as("sa"))
      .head().getSeq[Long](0)
    assert(xxSig.length == 4 && xxSig.forall(b => b >= 0L && b < 65536L),
      "4x16-bit Manku bands kept under xxhash64")
  }
}
