package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Differential subquery barrage (r13 wave 2): correlated scalar
  * subqueries (missing match -> NULL), EXISTS / NOT EXISTS, IN /
  * NOT IN with a NULL in the subquery (NOT IN collapses to empty —
  * standard three-valued logic on both engines), quantified ANY / ALL
  * comparisons, LATERAL and LEFT JOIN LATERAL, and correlated
  * aggregates in the select list — each row set MEASURED on REAL
  * DuckDB 1.0 and replayed through the router.
  *
  * Documented divergence (BarrageSpec-pinned, README): DuckDB 1.0
  * returns the FIRST row of a multi-row scalar subquery; Spark (and
  * newer DuckDB) raise — the engine keeps the LOUD behavior.
  */
class SubqueryDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val T = "(VALUES (1,'a',10),(2,'b',20),(3,'a',30)) t(id, g, v)"
  private val U = "(VALUES (10,'x'),(20,'y'),(99,'z')) u(v, w)"

  // (query, DuckDB-measured rows)
  private def fixtures: Seq[(String, List[List[Any]])] = Seq(
    (s"SELECT id, (SELECT w FROM $U WHERE u.v = t.v) AS w FROM $T ORDER BY id",
      List(List(1, "x"), List(2, "y"), List(3, null))),
    (s"SELECT id FROM $T WHERE EXISTS (SELECT 1 FROM $U WHERE u.v = t.v) ORDER BY id",
      List(List(1), List(2))),
    (s"SELECT id FROM $T WHERE NOT EXISTS (SELECT 1 FROM $U WHERE u.v = t.v) ORDER BY id",
      List(List(3))),
    (s"SELECT id FROM $T WHERE v IN (SELECT v FROM (VALUES (10),(NULL)) s(v)) ORDER BY id",
      List(List(1))),
    (s"SELECT id FROM $T WHERE v NOT IN (SELECT v FROM (VALUES (10),(NULL)) s(v)) ORDER BY id",
      Nil),
    (s"SELECT id FROM $T WHERE v NOT IN (SELECT v FROM (VALUES (10),(20)) s(v)) ORDER BY id",
      List(List(3))),
    (s"SELECT id FROM $T WHERE v > ANY (SELECT v FROM $U WHERE v < 50) ORDER BY id",
      List(List(2), List(3))),
    (s"SELECT id FROM $T WHERE v >= ALL (SELECT v FROM (VALUES (10),(20)) s(v)) ORDER BY id",
      List(List(2), List(3))),
    (s"SELECT id FROM $T WHERE v < ANY (SELECT v FROM (VALUES (15),(25)) s(v)) ORDER BY id",
      List(List(1), List(2))),
    (s"SELECT id FROM $T WHERE v <= ALL (SELECT v FROM (VALUES (15),(25)) s(v)) ORDER BY id",
      List(List(1))),
    (s"SELECT id FROM $T WHERE v = ANY (SELECT v FROM $U) ORDER BY id",
      List(List(1), List(2))),
    (s"SELECT id FROM $T WHERE v <> ALL (SELECT v FROM $U) ORDER BY id",
      List(List(3))),
    (s"SELECT t.id, l.m FROM $T, LATERAL (SELECT max(u.v) AS m FROM $U WHERE u.v <= t.v) l ORDER BY t.id",
      List(List(1, 10), List(2, 20), List(3, 20))),
    (s"SELECT t.id, l.v2 FROM $T LEFT JOIN LATERAL (SELECT u.v AS v2 FROM $U WHERE u.v = t.v AND u.w <> 'z') l ON true ORDER BY t.id",
      List(List(1, 10), List(2, 20), List(3, null))),
    (s"SELECT id, CAST((SELECT count(*) FROM $U WHERE u.v <= t.v) AS INTEGER) AS c FROM $T ORDER BY id",
      List(List(1, 1), List(2, 2), List(3, 2))),
    // r14: quantified-comparison NULL/empty-set edges (ADVICE high) —
    // `> ALL (empty)` is TRUE, `> ANY (empty)` FALSE, a NULL element
    // is NULL unless a non-NULL element decides. All measured.
    (s"SELECT id FROM $T WHERE v > ALL (SELECT v FROM $U WHERE v > 999) ORDER BY id",
      List(List(1), List(2), List(3))),
    (s"SELECT id FROM $T WHERE v > ANY (SELECT v FROM $U WHERE v > 999) ORDER BY id",
      Nil),
    (s"SELECT id FROM $T WHERE v <= ALL (SELECT v FROM $U WHERE v > 999) ORDER BY id",
      List(List(1), List(2), List(3))),
    (s"SELECT id FROM $T WHERE v > ALL (VALUES (5),(NULL)) ORDER BY id",
      Nil),
    (s"SELECT id FROM $T WHERE v > ALL (VALUES (25),(NULL)) ORDER BY id",
      Nil),
    (s"SELECT id FROM $T WHERE v > ANY (VALUES (15),(NULL)) ORDER BY id",
      List(List(2), List(3))),
    (s"SELECT id FROM $T WHERE NOT (v > ANY (VALUES (15),(NULL))) ORDER BY id",
      Nil),
    (s"SELECT id FROM $T WHERE v > ALL (VALUES (CAST(NULL AS INT))) ORDER BY id",
      Nil),
    (s"SELECT id FROM $T WHERE v + 5 > ALL (VALUES (20),(34)) ORDER BY id",
      List(List(3))),
    (s"SELECT id, v > ANY (VALUES (25),(NULL)) AS b FROM $T ORDER BY id",
      List(List(1, null), List(2, null), List(3, true))),
    (s"SELECT id, v >= ALL (SELECT v FROM $U WHERE v > 999) AS b FROM $T ORDER BY id",
      List(List(1, true), List(2, true), List(3, true))),
    (s"SELECT id, NULL > ALL (SELECT v FROM $U WHERE v > 999) AS b FROM $T ORDER BY id",
      List(List(1, true), List(2, true), List(3, true))),
    (s"SELECT id FROM $T WHERE v < SOME (VALUES (15),(NULL)) ORDER BY id",
      List(List(1))),
    // r14: CORRELATED quantified bodies — the CASE reduction emits
    // three correlated scalar aggregates per comparison
    (s"SELECT id FROM $T WHERE v >= ALL (SELECT u.v FROM $U WHERE u.v <= t.v) ORDER BY id",
      List(List(1), List(2), List(3))),
    (s"SELECT id FROM $T WHERE v > ANY (SELECT u.v FROM $U WHERE u.v < t.v) ORDER BY id",
      List(List(2), List(3))),
    (s"SELECT id FROM $T WHERE v > ALL (SELECT u.v FROM $U WHERE u.v > t.v) ORDER BY id",
      Nil))

  test("31 DuckDB-measured subquery/lateral row sets match through the router") {
    val dir = Files.createTempDirectory("graft_subqdiff").toString
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
