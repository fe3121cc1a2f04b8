package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** r9 pipeline operators: duplicated-passage removal (segment dedup),
  * the per-source domain cap, and token-budget mixture sampling.
  *
  * The load-bearing assertions are the EQUIVALENCES: the scale spelling
  * (bounded-buffer aggregate / two-level bucket plan) must emit exactly
  * what the straightforward window spelling emits — that is what makes
  * the window-based oracle SQL a valid twin for a plan that never sorts
  * a whole source.
  */
class Round9PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------ segment dedup

  test("segment dedup removes a passage shared by >SegDupDf docs, keeps unique text") {
    // seg width is 10 words: build aligned 10-word segments explicitly
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    def uniq(d: Int) = (1 to 10).map(i => s"doc${d}w$i").mkString(" ")
    // docs 1-3 share the SAME first segment (df 3 > 2 → removed);
    // doc 4's segments are all unique (df 1 → kept in full)
    val docs = Seq(
      (1L, s"$boiler ${uniq(1)}"),
      (2L, s"$boiler ${uniq(2)}"),
      (3L, s"$boiler ${uniq(3)}"),
      (4L, s"${uniq(4)} ${uniq(5)}")).toDF("doc_id", "nt")
    val out = QueriesLlm.segmentDedupFromDocs(docs)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 2L, 2L)))
    // doc 1's rewritten text is exactly its unique tail segment
    val clean1 = out(0).getAs[Long]("clean_len")
    assert(clean1 == uniq(1).length.toLong)
  }

  test("segment dedup rewrites to '' when every segment is corpus-common") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = (1L to 4L).map(d => (d, boiler)).toDF("doc_id", "nt")
    val out = QueriesLlm.segmentDedupFromDocs(docs).orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("n_kept") == 0L))
    assert(out.forall(_.getAs[Long]("clean_len") == 0L))
    // md5('') — the defined digest of an emptied doc, same on both engines
    assert(out.forall(_.getAs[String]("clean_digest") == "d41d8cd98f00b204"))
  }

  // ---------------------------------------------------------- domain cap

  test("domain cap == the row_number window spelling; caps bite per source") {
    // sources of size 50 / 30 / 12 under cap 20 → kept 20 / 20 / 12
    val docs = ((1L to 50L).map((_, "big")) ++ (51L to 80L).map((_, "mid")) ++
      (81L to 92L).map((_, "tiny"))).toDF("doc_id", "source")
    val out = QueriesLlm.domainCapFromDocs(docs, 20)
    val kept = out.groupBy("source").agg(sum("kept").as("k"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept("big") == ((20L, 50L)))
    assert(kept("mid") == ((20L, 30L)))
    assert(kept("tiny") == ((12L, 12L)))
    // exact keep-set equivalence with the window spelling
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    val ref = docs.withColumn("rnk", row_number().over(w))
      .select(col("doc_id"), (col("rnk") <= 20).cast("long").as("kept"))
    val diff = out.select("doc_id", "kept").exceptAll(ref).count() +
      ref.exceptAll(out.select("doc_id", "kept")).count()
    assert(diff == 0L, s"$diff verdict rows differ from the window spelling")
  }

  test("domain cap plans no window and no per-source sort") {
    val p = QueriesLlm.queries("q_llm_domain_cap")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "domain cap must not plan a window")
    assert(p.contains("BroadcastHashJoin"), "keep-set verdict join should broadcast")
  }

  test("segment dedup keeps a partial tail segment intact") {
    // 14 words = one full 10-word segment + a 4-word tail; both unique
    val words = (1 to 14).map(i => s"t$i").mkString(" ")
    val out = QueriesLlm.segmentDedupFromDocs(
      Seq((1L, words)).toDF("doc_id", "nt")).collect()
    assert(out.head.getAs[Long]("n_segs") == 2L)
    assert(out.head.getAs[Long]("n_kept") == 2L)
    // reassembly restores the exact original text
    assert(out.head.getAs[Long]("clean_len") == words.length.toLong)
  }

  test("domain cap 0 drops everything; mixture frac 0 keeps nothing") {
    val docs = (1L to 30L).map(i => (i, "s", "a b c")).toDF("doc_id", "source", "nt")
    val capped = QueriesLlm.domainCapFromDocs(
      docs.select("doc_id", "source"), 0)
    assert(capped.agg(sum("kept")).head().getLong(0) == 0L)
    val mixed = QueriesLlm.mixtureVerdictsFromDocs(docs, 0.0)
    assert(mixed.agg(sum("kept")).head().getLong(0) == 0L)
    assert(mixed.count() == 30L, "every doc still gets a verdict row")
  }

  // ------------------------------------------------------ mixture sample

  test("bucketed mixture == the window-cumsum reference, incl. boundary buckets") {
    // 1200 docs, 3 sources, token counts 1..40 — budgets land INSIDE
    // buckets so the boundary path is exercised (asserted below)
    val docs = (1L to 1200L).map { i =>
      val src = Seq("srcA", "srcB", "wide_source")(i.toInt % 3)
      val words = (1 to (i % 40 + 1).toInt).map(j => s"w$j").mkString(" ")
      (i, src, words)
    }.toDF("doc_id", "source", "nt")
    val fast = QueriesLlm.mixtureVerdictsFromDocs(docs, 0.5)
    val ref = QueriesLlm.mixtureVerdictsReference(docs, 0.5)
    val cols = Seq("doc_id", "source", "tok", "kept")
    val diff = fast.select(cols.map(col): _*).exceptAll(ref.select(cols.map(col): _*)).count() +
      ref.select(cols.map(col): _*).exceptAll(fast.select(cols.map(col): _*)).count()
    assert(diff == 0L, s"$diff verdict rows differ between bucketed and window plans")
    // the budgets really fall inside buckets (mixed verdicts per source)
    val mixed = fast.groupBy("source")
      .agg((sum("kept") > 0L && sum("kept") < count(lit(1))).as("mixed"))
      .filter(col("mixed")).count()
    assert(mixed >= 2, "expected at least two sources with a real boundary")
  }

  // --------------------------------------------------- product quantization

  test("PQ: codebook seed vectors reconstruct exactly (mse 0, own codes)") {
    val out = QueriesLlm.queries("q_llm_embed_pq")(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 16).collect()
    assert(out.length == 16)
    out.foreach { r =>
      val k = r.getLong(0)
      assert(r.getAs[String]("codes") == Seq.fill(8)(k).mkString(","),
        s"seed $k should quantize to its own code in every subspace")
      assert(r.getAs[Double]("mse") == 0.0)
    }
  }

  test("PQ plans a broadcast codebook join and aggregate argmin (no window)") {
    val p = QueriesLlm.queries("q_llm_embed_pq")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "codebook join must broadcast")
    assert(!p.contains("Window"), "argmin must be the aggregate, not a window")
  }

  test("segment dedup and mixture plan no cartesian products") {
    for (q <- Seq("q_llm_segment_dedup", "q_llm_mixture_sample", "q_llm_entropy",
        "q_llm_pipeline_e2e")) {
      val p = QueriesLlm.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("mixture budgets: weighted 2x for 4-char sources, frac of corpus tokens") {
    val docs = Seq((1L, "srcA", "a b c d"), (2L, "longsrc", "a b c d")) // 4 tokens each
      .toDF("doc_id", "source", "nt")
    val b = QueriesLlm.mixtureBudgets(docs, 0.5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // total 8 tokens, frac 0.5 → 4 split 2:1 → floor(2.667), floor(1.333)
    assert(b("srcA") == 2L)
    assert(b("longsrc") == 1L)
  }
}
