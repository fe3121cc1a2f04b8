package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Copy-detect's df≤cap fingerprint prune is SEMANTIC (the MOSS rule:
  * fingerprints in too many documents are boilerplate, not copy
  * evidence — Schleimer et al. §4), so the pruned-vs-unpruned recall
  * methodology ContainRecallSpec uses does not apply: measured on the
  * low-entropy sf0.1 corpus the UNPRUNED detector calls 67k of 5k docs'
  * pairs "copies" (pairs sharing only corpus-common substrings), which
  * is the failure mode the prune exists to kill. What the detector must
  * guarantee instead, proven here on a constructed corpus:
  *  1. a pair sharing one long RARE passage IS found (winnowing's
  *     guarantee: any shared run of ≥ w+k-1 chars shares fingerprints);
  *  2. docs built ONLY from corpus-common boilerplate are NOT flagged;
  *  3. the prune changes nothing when no fingerprint is common
  *     (cap = ∞ equals cap = default on a clean corpus).
  */
class CopyDetectRecallSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  test("planted rare passage is detected; boilerplate-only pairs are not") {
    val s = spark
    import s.implicits._
    // 150 boilerplate docs: every one is the SAME small phrase pool in
    // rotated order, so all their fingerprints exceed the df cap
    val pool = Vector("lorem ipsum dolor", "the quick brown fox", "pack my box",
      "sphinx of black quartz", "how vexingly quick", "waltz bad nymph")
    val boiler = (0 until 150).map { i =>
      (i.toLong, (0 until 6).map(j => pool((i + j) % pool.size)).mkString(" "))
    }
    // two docs sharing one long RARE passage, wrapped in distinct noise
    val rare = "zq" + lcg(7).map(x => ('a' + (x % 26).toInt).toChar).take(120).mkString
    val noiseA = lcg(1234).map(x => ('a' + (x % 26).toInt).toChar).take(80).mkString
    val noiseB = lcg(5678).map(x => ('a' + (x % 26).toInt).toChar).take(80).mkString
    val docs = s.createDataset(
      boiler ++ Seq((1000L, s"$noiseA $rare"), (1001L, s"$rare $noiseB")))
      .toDF("doc_id", "nt")
    val pairs = QueriesLlm.copyDetectPairsFromDocs(docs, QueriesLlm.MaxBucket)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1000L, 1001L)), s"planted copy pair missed: $pairs")
    assert(!pairs.exists { case (a, b) => a < 1000 && b < 1000 },
      s"boilerplate-only pairs flagged as copies: ${pairs.filter(_._1 < 1000)}")
  }

  test("on a clean corpus the cap is inert (pruned == unpruned)") {
    val s = spark
    import s.implicits._
    // 40 docs of distinct random text + 3 clone pairs — no fingerprint
    // reaches the cap, so the prune must change NOTHING
    val uniq = (0 until 40).map(i =>
      (i.toLong, lcg(i * 97L + 11).map(x => ('a' + (x % 26).toInt).toChar).take(150).mkString))
    val clones = Seq(100L, 102L, 104L).flatMap { id =>
      val t = lcg(id * 31L).map(x => ('a' + (x % 26).toInt).toChar).take(150).mkString
      Seq((id, t), (id + 1, t))
    }
    val docs = s.createDataset(uniq ++ clones).toDF("doc_id", "nt")
    def pairs(cap: Int) = QueriesLlm.copyDetectPairsFromDocs(docs, cap)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = pairs(QueriesLlm.MaxBucket)
    assert(pruned == pairs(Int.MaxValue), "cap changed results on a clean corpus")
    assert(Set((100L, 101L), (102L, 103L), (104L, 105L)).subsetOf(pruned), pruned.toString)
  }
}
