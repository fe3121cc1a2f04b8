package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[BoundedTopK]] is per-group TakeOrdered: the k (key, id) pairs with
  * the smallest (key asc, id asc) rank, computed with every aggregation
  * buffer — map-side partial and reduce-side final — holding ≤ k
  * elements by construction. The window spelling
  * (`row_number() OVER (PARTITION BY g ORDER BY key, id) <= k`) sorts
  * each whole group to keep k rows; this costs one partial-agg shuffle
  * of ≤ k rows per (partition, group). These tests pin exact equality
  * with that ground truth across partition layouts (which exercises the
  * partial/merge path) and the edge cases.
  */
class BoundedTopKSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  private def groundTruth(rows: Seq[(String, String, Long)], k: Int): Map[String, Seq[Long]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted.take(k).map(_._2).sorted
    }

  private def viaAgg(rows: Seq[(String, String, Long)], k: Int, parts: Int): Map[String, Seq[Long]] = {
    val s = spark
    import s.implicits._
    s.createDataset(rows).toDF("g", "key", "id").repartition(parts)
      .groupBy("g")
      .agg(BoundedCollect.boundedTopKCol(col("key"), col("id"), k).as("ids"))
      .select(col("g"), array_sort(col("ids")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
  }

  test("matches the window-ranked ground truth across partition layouts") {
    // deterministic pseudo-random keys; group sizes 1..60 straddle k
    var x = 12345L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 16 }
    val rows = (0 until 12).flatMap { g =>
      (0 to (g * 5) % 60).map { i =>
        (s"g$g", f"${next() % 1000}%04d", next() % 100000)
      }
    }
    val k = 3
    val expect = groundTruth(rows, k)
    for (parts <- Seq(1, 7, 32)) {
      assert(viaAgg(rows, k, parts) == expect, s"parts=$parts")
    }
  }

  test("key ties break by id; groups smaller than k collect in full") {
    val rows = Seq(
      ("a", "same", 30L), ("a", "same", 10L), ("a", "same", 20L), ("a", "zz", 1L),
      ("b", "k1", 7L))
    assert(viaAgg(rows, 2, 4) == Map("a" -> Seq(10L, 20L), "b" -> Seq(7L)))
  }

  test("null keys and ids are skipped, not ranked") {
    val s = spark
    import s.implicits._
    val df = s.createDataset(Seq(
      (Option("a"), Option(1L)), (None: Option[String], Option(2L)),
      (Option("b"), None: Option[Long]), (Option("c"), Option(3L))))
      .toDF("key", "id")
    val out = df.agg(BoundedCollect.boundedTopKCol(col("key"), col("id"), 5).as("ids"))
      .select(array_sort(col("ids"))).head().getSeq[Long](0)
    assert(out == Seq(1L, 3L))
  }

  // ------------------------------------------------ string-payload variant

  private def stringGroundTruth(rows: Seq[(String, String, String)], k: Int): Map[String, Seq[String]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted.take(k).map(_._2).sorted
    }

  private def viaStringAgg(rows: Seq[(String, String, String)], k: Int, parts: Int): Map[String, Seq[String]] = {
    val s = spark
    import s.implicits._
    s.createDataset(rows).toDF("g", "key", "payload").repartition(parts)
      .groupBy("g")
      .agg(BoundedCollect.boundedTopKStringsCol(col("key"), col("payload"), k).as("ps"))
      .select(col("g"), array_sort(col("ps")).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
  }

  test("strings variant matches the window-ranked ground truth across partition layouts") {
    var x = 54321L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 16 }
    val rows = (0 until 10).flatMap { g =>
      (0 to (g * 7) % 50).map { i =>
        (s"g$g", f"${next() % 1000}%04d", s"p${next() % 10000}")
      }
    }
    val k = 4
    val expect = stringGroundTruth(rows, k)
    for (parts <- Seq(1, 7, 32)) {
      assert(viaStringAgg(rows, k, parts) == expect, s"parts=$parts")
    }
  }

  test("strings variant: key ties break by payload; nulls are skipped") {
    val rows = Seq(
      ("a", "same", "pz"), ("a", "same", "pa"), ("a", "same", "pm"), ("a", "zz", "p0"),
      ("b", "k1", "only"))
    assert(viaStringAgg(rows, 2, 3) == Map("a" -> Seq("pa", "pm"), "b" -> Seq("only")))
    val s = spark
    import s.implicits._
    val df = s.createDataset(Seq(
      (Option("a"), Option("x1")), (None: Option[String], Option("x2")),
      (Option("b"), None: Option[String]), (Option("c"), Option("x3"))))
      .toDF("key", "payload")
    val out = df.agg(BoundedCollect.boundedTopKStringsCol(col("key"), col("payload"), 5).as("ps"))
      .select(array_sort(col("ps"))).head().getSeq[String](0)
    assert(out == Seq("x1", "x3"))
  }
}
