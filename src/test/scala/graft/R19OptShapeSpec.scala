package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** r19 optimization round, batch A pins: every plan-shape rewrite in the
  * dedup family must keep the produced SET bit-identical to the shape it
  * replaced (the oracle gate proves Spark-vs-DuckDB; these prove
  * new-Spark-vs-old-Spark directly, so a drift cannot hide behind a
  * lockstep twin change).
  *
  *  1. minhashPairs' merged clique+count aggregation (one exchange over
  *     the band stream) vs the former two-pass spelling
  *     (cappedIdListsSampled + a separate count()): identical truncated
  *     lists AND identical over-cap key sets, including buckets AT and
  *     OVER the cap.
  *  2. `ordered = false` only drops the final sort: identical pair sets.
  *  3. keep_best's window-argmax canonical vs the former
  *     groupBy + join-back.
  *  4. pipeline_e2e's window-min exact-keep vs the former
  *     groupBy(min) + join-back.
  */
class R19OptShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.01"

  private def keyedRows(): DataFrame = {
    // synthetic band stream with an under-cap, an at-cap, and an over-cap
    // bucket (cap = 3), plus a singleton that must drop (|ds| < 2)
    val rows = Seq(
      (0, "u", 11L), (0, "u", 12L),                      // under cap
      (0, "a", 1L), (0, "a", 2L), (0, "a", 3L),          // exactly at cap
      (1, "o", 21L), (1, "o", 22L), (1, "o", 23L),
      (1, "o", 24L), (1, "o", 25L),                      // over cap
      (1, "s", 31L))                                     // singleton
    spark.createDataFrame(rows).toDF("band", "bkey", "doc_id")
  }

  test("merged clique+count aggregation equals the two-pass spelling") {
    val rows = keyedRows()
    val cap = 3
    // two-pass reference (the pre-r19 shape)
    val refLists = QueriesLlm.cappedIdListsSampled(
        rows, Seq("band", "bkey"), "doc_id", cap)
      .select(col("band"), col("bkey"), col("ds"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getSeq[Long](2)))
      .toSet
    val refOver = rows.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > cap)
      .select("band", "bkey").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    // one-pass merged shape (what minhashPairs now plans)
    val rank = md5(concat_ws("_", col("band").cast(StringType),
      col("bkey"), col("doc_id").cast(StringType)))
    val grouped = rows.groupBy(col("band"), col("bkey"))
      .agg(graft.functions.BoundedCollect
        .boundedTopKCol(rank, col("doc_id").cast(LongType), cap).as("ds0"),
        count(lit(1)).as("bsz"))
    val newLists = grouped
      .select(col("band"), col("bkey"), sort_array(col("ds0")).as("ds"))
      .filter(size(col("ds")) >= 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getSeq[Long](2)))
      .toSet
    val newOver = grouped.filter(col("bsz") > cap)
      .select("band", "bkey").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(newLists === refLists)
    assert(newOver === refOver)
    // the over-cap bucket really truncated (buffer bound held)
    assert(newLists.filter(t => t._2 == "o").head._3.size === cap)
  }

  test("ordered=false changes only the sort: identical pair sets") {
    val pairs = { (ord: Boolean) =>
      QueriesLlm.minhashPairs(QueriesLlm.shinglesDF(spark, d),
          QueriesLlm.NumHashes, QueriesLlm.Bands, 0.5,
          ordered = ord)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    }
    val o = pairs(true)
    val u = pairs(false)
    assert(o.nonEmpty)
    assert(u === o)
  }

  test("window-argmax canonical equals groupBy + join-back (keep_best)") {
    val lab = spark.createDataFrame(Seq(
      (1L, 10L, 100L), (2L, 10L, 300L), (3L, 10L, 300L), // tie on n_chars
      (4L, 40L, 50L), (5L, 40L, 60L))).toDF("doc_id", "label", "n_chars")
    val canonRef = lab.groupBy("label")
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("m"),
        count(lit(1)).as("cluster_size"))
      .select(col("label"), (-col("m.nid")).as("canonical_id"),
        col("cluster_size"))
    val ref = lab.join(canonRef, "label")
      .select(col("doc_id"), col("label"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).cast(LongType).as("kept"),
        col("cluster_size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val w = Window.partitionBy("label")
    val neu = lab
      .withColumn("m",
        max(struct(col("n_chars"), (-col("doc_id")).as("nid"))).over(w))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("label"), (-col("m.nid")).as("canonical_id"),
        (col("doc_id") === -col("m.nid")).cast(LongType).as("kept"),
        col("cluster_size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(neu === ref)
    // tie-break: min doc_id among max-n_chars wins (2, not 3)
    assert(neu.filter(_._2 == 10L).head._3 === 2L)
  }

  test("explode-both-directions equals the two-branch union (contain)") {
    val scored = spark.createDataFrame(Seq(
      (1L, 2L, 9L, 10L, 100L),   // a-direction passes (0.9), b fails
      (3L, 4L, 10L, 10L, 10L),   // both pass (1.0 each)
      (5L, 6L, 1L, 10L, 10L)))   // both fail
      .toDF("a", "b", "inter", "sza", "szb")
    val thr = 0.9
    val dirA = scored
      .filter(col("inter").cast(DoubleType) / col("sza") >= thr)
      .select(col("a").as("contained"), col("b").as("container"),
        round(col("inter").cast(DoubleType) / col("sza"), 4).as("containment"))
    val dirB = scored
      .filter(col("inter").cast(DoubleType) / col("szb") >= thr)
      .select(col("b").as("contained"), col("a").as("container"),
        round(col("inter").cast(DoubleType) / col("szb"), 4).as("containment"))
    val ref = dirA.unionByName(dirB).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val neu = scored.select(explode(array(
        struct(col("a").as("contained"), col("b").as("container"),
          (col("inter").cast(DoubleType) / col("sza")).as("raw")),
        struct(col("b").as("contained"), col("a").as("container"),
          (col("inter").cast(DoubleType) / col("szb")).as("raw")))).as("r"))
      .filter(col("r.raw") >= thr)
      .select(col("r.contained"), col("r.container"),
        round(col("r.raw"), 4).as("containment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(neu.toSeq === ref.toSeq)
    assert(ref.length === 3)
  }

  test("window base-count exact check equals the semi-join (incremental)") {
    val withNh = Tables.t(spark, d, "documents")
      .select(col("doc_id"),
        substring(md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))),
          1, 16).as("nh"))
    val newDocsRef = withNh.filter(col("doc_id") % 4 === 0)
    val ref = newDocsRef
      .join(withNh.filter(col("doc_id") % 4 =!= 0).select("nh").distinct(),
        Seq("nh"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val w = Window.partitionBy("nh")
    val neu = withNh
      .withColumn("base_cnt",
        sum(when(col("doc_id") % 4 =!= 0, 1L).otherwise(0L)).over(w))
      .filter(col("doc_id") % 4 === 0)
      .filter(col("base_cnt") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(neu === ref)
    // and the universe of new docs is unchanged
    val allNew = newDocsRef.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(neu.subsetOf(allNew))
  }

  test("window gram-df equals count aggregate + join-back (boilerplate)") {
    // grams carry one row per (doc, DISTINCT gram), so a plain row count
    // per gram equals the df the join-back shape computed
    val grams = spark.createDataFrame(Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (3L, 10L), (3L, 30L)))
      .toDF("doc_id", "g")
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val ref = grams.join(dfreq, "g")
      .select("doc_id", "g", "df").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val neu = grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy("g")))
      .select("doc_id", "g", "df").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(neu === ref)
  }

  test("stacked-window segment df equals distinct + groupBy + join-back") {
    // includes an intra-doc duplicate segment (doc 1 holds seg "x" twice)
    // — the case where a plain per-row count would overcount vs the
    // distinct-doc df
    val segs = spark.createDataFrame(Seq(
      (1L, 1, "x"), (1L, 2, "x"), (1L, 3, "y"),
      (2L, 1, "x"), (3L, 1, "y"))).toDF("doc_id", "seg_idx", "seg")
    val dfreq = segs.select("doc_id", "seg").distinct()
      .groupBy("seg").agg(count(lit(1)).as("df"))
    val ref = segs.join(dfreq, "seg")
      .select("doc_id", "seg_idx", "seg", "df").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    val wDocSeg = Window.partitionBy("doc_id", "seg").orderBy("seg_idx")
    val neu = segs
      .withColumn("first_occ",
        when(row_number().over(wDocSeg) === 1, 1L).otherwise(0L))
      .withColumn("df", sum(col("first_occ")).over(Window.partitionBy("seg")))
      .select("doc_id", "seg_idx", "seg", "df").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(neu === ref)
    // df of "x" is 2 docs (not 3 rows)
    assert(ref.filter(_._3 == "x").forall(_._4 == 2L))
  }

  test("window-min exact-keep equals groupBy(min) + join-back (e2e)") {
    val docs = Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("n_chars"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("nt"))
    val refKeep = docs
      .groupBy(substring(md5(col("nt")), 1, 16).as("nh"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val ref = docs.join(refKeep, "doc_id").select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(substring(md5(col("nt")), 1, 16))
    val neu = docs
      .withColumn("min_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("min_id"))
      .select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(neu === ref)
    assert(neu.nonEmpty)
  }
}
