package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The connected-components strategies ([[QueriesLlm.ccLabels]])
  * must be interchangeable: identical (doc_id -> min-of-component) labels
  * on every input shape. Near-dup pair sets are near-cliques (the regime
  * the default is tuned for); the chain and the two-cluster graph force
  * multi-superstep convergence where the strategies' round counts
  * actually differ.
  */
class CcSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def pairsDF(ps: Seq[(Long, Long)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      ps.map(p => Row(p._1, p._2)).asJava,
      StructType(Seq(StructField("a", LongType, false), StructField("b", LongType, false))))
  }

  private def labels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def allThree(ps: Seq[(Long, Long)]): Seq[Map[Long, Long]] = {
    val df = pairsDF(ps)
    Seq(QueriesLlm.ccMinLabel(spark, df),
        QueriesLlm.ccTwoHop(spark, df),
        QueriesLlm.ccStars(spark, df),
        QueriesLlm.ccUnionFind(spark, df)).map(labels)
  }

  test("clique + isolated pair: every strategy labels by component min") {
    val ps = Seq[(Long, Long)]((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L))
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    allThree(ps).foreach(l => assert(l == expected))
  }

  test("long chain (diameter 9) converges on all strategies") {
    val ps = (1L to 9L).map(i => (i, i + 1))
    val expected = (1L to 10L).map(_ -> 1L).toMap
    allThree(ps).foreach(l => assert(l == expected))
  }

  test("two chains meeting at a high id + reversed pair order") {
    // labels must flow from the GLOBAL min across the join point, and the
    // input orientation (a>b vs a<b) must not matter
    val ps = Seq[(Long, Long)]((5L, 4L), (4L, 3L), (100L, 5L), (100L, 50L),
      (50L, 60L), (60L, 70L))
    val expected = Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 100L -> 3L,
      50L -> 3L, 60L -> 3L, 70L -> 3L)
    allThree(ps).foreach(l => assert(l == expected))
  }

  test("empty pair set yields empty labels on all strategies") {
    allThree(Seq.empty).foreach(l => assert(l.isEmpty))
  }

  test("strategies agree on the real sf0.001 near-dup pair set") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val pairs = QueriesLlm.queries("q_llm_dedup_near")(spark, d).select("a", "b")
    val Seq(a, b, c, u) = Seq(
      QueriesLlm.ccMinLabel(spark, pairs),
      QueriesLlm.ccTwoHop(spark, pairs),
      QueriesLlm.ccStars(spark, pairs),
      QueriesLlm.ccUnionFind(spark, pairs)).map(labels)
    assert(a.nonEmpty)
    assert(a == b)
    assert(a == c)
    assert(a == u)
  }

  test("loop conf is restored even when shuffle partitions were lowered") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    QueriesLlm.ccTwoHop(spark, pairsDF(Seq((1L, 2L))))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore)
  }
}
