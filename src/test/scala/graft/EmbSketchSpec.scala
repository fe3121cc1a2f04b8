package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bit-exactness of the native LSH plane-bucket expression
  * ([[graft.functions.EmbSketch]]) against the interpreted
  * `aggregate(zip_with(...))` chain it replaced — on the REAL embedding
  * corpus, for both the oracle-default (1×8) and banded (8×8) plane
  * tables, so every bucket key the dedup/ANN paths shuffle is proven
  * identical to the formulation the DuckDB twins state.
  */
class EmbSketchSpec extends AnyFunSuite {
  private val d = "/root/testdata/sf0.001"
  private def spark = SparkTestSession.spark
  private def emb = Tables.t(spark, d, "embeddings")

  private def keysOf(native: Boolean, nTables: Int, nPlanes: Int): Map[Long, Seq[String]] = {
    val tabs = QueriesLlm.embPlaneTables(nTables, nPlanes)
    val k =
      if (native) QueriesLlm.bucketKeysExpr(col("embedding"), tabs)
      else QueriesLlm.bucketKeysExprReference(col("embedding"), tabs)
    emb.select(col("vec_id"), k.as("ks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
  }

  test("native plane buckets equal the interpreted chain (1x8 and 8x8)") {
    assume(new java.io.File(s"$d/embeddings.parquet").exists())
    for ((t, p) <- Seq((1, 8), (8, 8))) {
      val native = keysOf(native = true, t, p)
      val ref = keysOf(native = false, t, p)
      assert(native == ref, s"bucket keys diverge for ${t}x$p")
    }
  }

  test("length-mismatched and null-element vectors bucket as all-'0' on BOTH paths") {
    val s = spark
    import s.implicits._
    // shorter, longer, and null-poisoned than the 64-dim planes — the
    // corrupt/variable-dim ingest case a fixed-dim corpus cannot cover
    val vecs = Seq(
      (1L, Array.fill(32)(0.5f).toSeq.map(Option(_))),
      (2L, Array.fill(80)(0.5f).toSeq.map(Option(_))),
      (3L, Array.fill(64)(0.5f).toSeq.map(Option(_)).updated(7, None)),
      (4L, Array.fill(64)(0.5f).toSeq.map(Option(_))))
    val df = s.createDataset(vecs).toDF("vec_id", "embedding")
    val tabs = QueriesLlm.embPlaneTables(2, 4)
    def keys(native: Boolean) = df.select(col("vec_id"),
        (if (native) QueriesLlm.bucketKeysExpr(col("embedding"), tabs)
         else QueriesLlm.bucketKeysExprReference(col("embedding"), tabs)).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val n = keys(native = true)
    assert(n == keys(native = false), "mismatch rows bucket differently across paths")
    for (id <- Seq(1L, 2L, 3L)) {
      assert(n(id).forall(_.matches("""\d:0+""")), s"row $id should be all-'0' bits: ${n(id)}")
    }
    assert(n(4L).exists(k => k.drop(2).contains("1")), "healthy row lost its sign bits")
  }

  test("native dot product equals the interpreted fold bit-for-bit on all pairs") {
    assume(new java.io.File(s"$d/embeddings.parquet").exists())
    val x = emb.limit(40).select(col("vec_id").as("a"), col("embedding").as("ea"))
    val y = emb.limit(40).select(col("vec_id").as("b"), col("embedding").as("eb"))
    val both = x.crossJoin(y).select(
      graft.functions.EmbSketch.arrayDotCol(col("ea"), col("eb")).as("nat"),
      QueriesLlm.dotReference(col("ea"), col("eb")).as("ref"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    // bit-identical, not approximately equal: the twins must hash equal
    assert(rows.forall(r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("a vector shorter than the plane dimension gets all-zero bits, like the null fold") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val tabs = QueriesLlm.embPlaneTables(2, 4)
    val native = df.select(QueriesLlm.bucketKeysExpr(col("embedding"), tabs).as("ks"))
      .collect()(0).getSeq[String](0)
    val ref = df.select(QueriesLlm.bucketKeysExprReference(col("embedding"), tabs).as("ks"))
      .collect()(0).getSeq[String](0)
    assert(native == ref)
    assert(native == Seq("0:0000", "1:0000"))
  }
}
