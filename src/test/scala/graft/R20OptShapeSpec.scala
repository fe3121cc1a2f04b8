package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r20 optimization equivalence pins (VERDICT r19 item 3): the window-df
  * spellings of q_llm_boilerplate / q_llm_segment_dedup traded skew
  * resilience for an exchange — `count over (partition by g)` buffers a
  * hot-by-design key's whole partition in one WindowExec task and is
  * excluded from AQE skew splitting. The r20 two-level + join-back-on-
  * survivors shape must produce the IDENTICAL per-row df verdicts. Each
  * test compares the new spelling against the literal r19 window
  * spelling, including a planted VIRAL key (present in every doc — the
  * skew case that motivated the rewrite) and the intra-doc duplicate
  * case the r19 spec pinned.
  */
class R20OptShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two-level common-gram join equals window gram-df (boilerplate)") {
    // viral gram 99 in every doc; gram 10 in two docs (df>2 at threshold 2
    // needs >2: make 10 appear in 3 docs); unique grams per doc
    val grams = Seq(
      (1L, 99L), (1L, 10L), (1L, 11L),
      (2L, 99L), (2L, 10L), (2L, 21L),
      (3L, 99L), (3L, 10L), (3L, 31L),
      (4L, 99L), (4L, 41L)).toDF("doc_id", "g")
    val thr = 2
    // r19 spelling: window count over g, per-doc aggregate
    val ref = grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > thr, 1L).otherwise(0L)).as("n_common"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // r20 spelling: map-side-combined df, >thr survivors join back
    val common = grams.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > thr).select(col("g"), lit(1L).as("hit"))
    val neu = grams.join(common, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_common"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(neu === ref)
    // the viral gram (df=4) and gram 10 (df=3) are common; per-doc checks
    assert(neu.contains((1L, 3L, 2L)) && neu.contains((4L, 2L, 1L)))
  }

  test("two-level distinct-df dup join equals stacked-window segment df") {
    // doc 1 holds seg "x" twice (intra-doc duplicate: df must count DOCS),
    // seg "v" is viral (every doc), "u*" unique
    val segs = Seq(
      (1L, 1, "v"), (1L, 2, "x"), (1L, 3, "x"), (1L, 4, "u1"),
      (2L, 1, "v"), (2L, 2, "x"), (2L, 3, "u2"),
      (3L, 1, "v"), (3L, 2, "x"), (3L, 3, "u3"),
      (4L, 1, "v"), (4L, 2, "u4")).toDF("doc_id", "seg_idx", "seg")
    val thr = 2
    def perDoc(withKeep: org.apache.spark.sql.DataFrame) = withKeep
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("seg_idx"), col("seg"))))),
          x => x("seg")), " ").as("clean"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    // r19 spelling: row_number marks + sum-over-seg window
    val wDocSeg = Window.partitionBy("doc_id", "seg").orderBy("seg_idx")
    val ref = perDoc(segs
      .withColumn("first_occ",
        when(row_number().over(wDocSeg) === 1, 1L).otherwise(0L))
      .withColumn("df", sum(col("first_occ")).over(Window.partitionBy("seg")))
      .withColumn("keep", col("df") <= thr))
    // r20 spelling: distinct pairs -> per-seg count -> dup table join
    val dup = segs.select("doc_id", "seg").distinct()
      .groupBy("seg").agg(count(lit(1)).as("df"))
      .filter(col("df") > thr).select(col("seg"), lit(true).as("is_dup"))
    val neu = perDoc(segs.join(dup, Seq("seg"), "left")
      .withColumn("keep", !coalesce(col("is_dup"), lit(false))))
    assert(neu === ref)
    // viral "v" (4 docs) and "x" (3 DOCS, despite 4 rows) dropped;
    // doc 1 keeps only u1 and counts 4 segments
    assert(neu.contains((1L, 4L, 1L, "u1")))
  }
}
