package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QueriesLlm

/** Edge behavior of the r9 operators on corpora the sf fixtures cannot
  * produce: single-doc (no pairs anywhere), engineered bigram ties, and
  * a planted exact/near/novel triple for the incremental dedup verdicts.
  * Each test runs the SAME registered query function the driver runs,
  * over a tiny documents.parquet written to a temp dir.
  */
class R9EdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** write (doc_id, text, lang, source) rows as <tmp>/documents.parquet */
  private def corpus(rows: Seq[(Long, String, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_r9_edge").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  test("single-doc corpus: pair operators are empty, per-doc operators well-formed") {
    val d = corpus(Seq((1L, "alpha beta gamma delta epsilon zeta", "en", "src0")))
    assert(run("q_llm_dedup_keep_best", d).count() == 0)
    assert(run("q_llm_source_overlap", d).count() == 0)
    val uni = run("q_llm_unigram_lm", d).collect()
    assert(uni.length == 1 && uni(0).getLong(1) == 6 &&
      uni(0).getDouble(2) == 1.0 && uni(0).getLong(3) == 1)
    val topk = run("q_llm_ngram_topk", d).collect()
    assert(topk.length == 5 && topk.forall(_.getLong(3) == 1))
    val chunk = run("q_llm_chunk", d).collect()
    assert(chunk.length == 1 && chunk(0).getLong(2) == 6)
  }

  test("ngram top-k: count desc then gram asc, capped at k") {
    // bigrams: "a b"x3, "b a"x2, "b c"/"c a"/"a c"… engineered so ties exist
    val d = corpus(Seq(
      (1L, "a b a b a b x", "en", "s"),
      (2L, "z y z y q r q r", "en", "s")))
    val rows = run("q_llm_ngram_topk", d).collect()
    assert(rows.length == 5, s"k caps output: ${rows.length}")
    val top = rows.map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    // counts non-increasing with rank; equal counts ordered by gram asc
    assert(top.map(_._3) == top.map(_._3).sorted.reverse)
    top.sliding(2).foreach { case Seq(a, b) =>
      if (a._3 == b._3) assert(a._2 < b._2, s"tie not gram-asc: $a vs $b")
    case _ => }
    assert(top.head == ((1L, "a b", 3L)))
  }

  test("incremental dedup: planted exact / near / novel verdicts") {
    val base = ("the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles carefully carry heavy wooden crates across narrow bridges " +
      "during long summer afternoons in quiet mountain villages near deep lakes")
    val nearTxt = base.replace("turtles", "tortoises")
    val d = corpus(Seq(
      (1L, base, "en", "base"),            // base shard (1 % 4 != 0)
      (2L, "completely unrelated text about database engines and query plans optimizers", "en", "base"),
      (4L, base.toUpperCase, "en", "new"), // exact dup after normalization
      (8L, nearTxt, "en", "new"),          // near dup (1-word perturbation)
      (12L, "entirely novel content regarding distributed stream processing watermarks checkpoints", "en", "new")))
    val out = run("q_llm_dedup_incremental", d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(4L -> "exact_dup", 8L -> "near_dup", 12L -> "novel"), out.toString)
  }

  test("leak-free split: near-dup cluster members land in the SAME split") {
    val base = ("the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles carefully carry heavy wooden crates across narrow bridges " +
      "during long summer afternoons in quiet mountain villages near deep lakes")
    // ids chosen so a doc-id hash split WOULD separate them; the cluster
    // key must glue them back together
    val d = corpus(Seq(
      (1L, base, "en", "s"),
      (2L, base.replace("turtles", "tortoises"), "en", "s"),
      (3L, base.replace("fox", "wolf"), "en", "s"),
      (9L, "unrelated standalone document about compilers and garbage collection", "en", "s")))
    val rows = run("q_llm_split_leakfree", d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val clustered = rows.filter(r => Set(1L, 2L, 3L).contains(r._1))
    assert(clustered.length == 3)
    assert(clustered.map(_._2).distinct.length == 1, s"split keys differ: $clustered")
    assert(clustered.map(_._3).distinct.length == 1, s"splits differ: $clustered")
    val solo = rows.find(_._1 == 9L).get
    assert(solo._2 == 9L, "unclustered doc must hash its own id")
  }

  test("sessionize: single event per user is one zero-duration session") {
    // runs on the real fixtures' schema via the events table — build inline
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_r9_sess").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "a", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 10L, "a", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 10L, "a", 1.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-05 09:00:00"), 20L, "b", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = run("q_ts_sessionize", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // user 10: events 1,2 in one session (10 min gap), event 3 a new one
    assert(rows.toSeq == Seq((10L, 1L, 2L, 600L), (10L, 2L, 1L, 0L), (20L, 1L, 1L, 0L)))
  }
}
