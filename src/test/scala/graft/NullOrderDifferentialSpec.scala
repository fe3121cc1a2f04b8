package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Differential null-ordering barrage (r13 wave 2): DuckDB's default
  * null ordering is NULLS LAST for BOTH directions, while Spark's ASC
  * default is NULLS FIRST — a plain `ORDER BY v` over a nullable key
  * silently reorders rows (and every window function ordered by a
  * nullable key silently re-ranks). Each row set below is MEASURED on
  * REAL DuckDB 1.0: top-level ASC/DESC, multi-key, window rank /
  * row_number over a nullable key, in-aggregate ORDER BY, and the
  * explicit NULLS FIRST spelling passing through untouched.
  */
class NullOrderDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val T = "(VALUES (1, 10), (2, NULL), (3, 5), (4, NULL), (5, 20)) t(id, v)"

  private def fixtures: Seq[(String, List[List[Any]])] = Seq(
    (s"SELECT id FROM $T ORDER BY v",
      List(List(3), List(1), List(5), List(2), List(4))),
    (s"SELECT id FROM $T ORDER BY v DESC",
      List(List(5), List(1), List(3), List(2), List(4))),
    (s"SELECT id FROM $T ORDER BY v ASC, id DESC",
      List(List(3), List(1), List(5), List(4), List(2))),
    (s"SELECT id, CAST(rank() OVER (ORDER BY v) AS INTEGER) AS r FROM $T ORDER BY id",
      List(List(1, 2), List(2, 4), List(3, 1), List(4, 4), List(5, 3))),
    (s"SELECT id, CAST(row_number() OVER (ORDER BY v DESC) AS INTEGER) AS r FROM $T ORDER BY id",
      List(List(1, 2), List(2, 4), List(3, 3), List(4, 5), List(5, 1))),
    (s"SELECT string_agg(CAST(id AS VARCHAR), ',' ORDER BY v) AS s FROM $T",
      List(List("3,1,5,2,4"))),
    (s"SELECT first(id ORDER BY v) AS f FROM $T",
      List(List(3))),
    (s"SELECT id FROM $T ORDER BY v NULLS FIRST",
      List(List(2), List(4), List(3), List(1), List(5))))

  test("8 DuckDB-measured null-ordering row sets match through the router") {
    val dir = Files.createTempDirectory("graft_nullorder").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    val bad = fixtures.flatMap { case (q, want) =>
      try {
        val got = lake.sql(q).collect().map(_.toSeq.toList).toList
        if (got == want) None
        else Some(s"$q\n  got  $got\n  want $want")
      } catch { case e: Throwable =>
        Some(s"$q FAILED: ${e.getMessage.linesIterator.take(1).mkString.take(140)}") }
    }
    assert(bad.isEmpty, s"${bad.size} mismatches:\n" + bad.mkString("\n"))
  }
}
