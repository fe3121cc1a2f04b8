package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** r17 ADVICE + VERDICT-task-4 closure — every expected value/error is
  * MEASURED on real DuckDB 1.0.0 (r18 probe session):
  *
  *  1. COPY FROM with a SINGLE-element NULLSTR list (bracket syntax)
  *     nulls the marker (old: the raw "['NA']" text became Spark's
  *     nullValue, so 'NA' loaded as a literal string).
  *  2. read_csv(skip >= line count) answers the EMPTY headerless
  *     one-column shape, never probing a pre-skip preamble line.
  *  3. read_csv ignore_errors with pinned types= DROPS rows whose cells
  *     fail conversion (old: ANSI cast threw; DuckDB drops the row).
  *  4. Named-window refusals: duplicate names (same clause AND across
  *     set-op branches), cannot-override PARTITION BY/ORDER BY,
  *     cannot-copy-a-framed-window, and cross-scope window references
  *     are LOUD errors — and a self-referential window def terminates
  *     (the old fixpoint inliner grew the string unboundedly).
  */
class R18EdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val lake: DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("graft_r18edge").toString
    new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
  }

  test("COPY FROM honors a single-element bracketed NULLSTR list " +
      "(DuckDB-measured)") {
    val dir = Files.createTempDirectory("graft_r18cf").toString
    lake.sql("CREATE TABLE cf1(id INTEGER, c VARCHAR)")
    lake.sql(s"COPY (SELECT 'id,c' || chr(10) || '1,NA' || chr(10) || " +
      s"'2,x' AS j) TO '$dir/cf1.csv' (FORMAT CSV, QUOTE '', HEADER false)")
    lake.sql(s"COPY cf1 FROM '$dir/cf1.csv' (FORMAT CSV, HEADER true, " +
      "NULLSTR ['NA'])")
    assert(lake.sql("SELECT coalesce(c, 'None') AS c FROM cf1 ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("None", "x"))
  }

  test("read_csv with skip >= line count answers empty column0, not a " +
      "probe of preamble junk (DuckDB-measured)") {
    val dir = Files.createTempDirectory("graft_r18skip").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/short.csv"),
      "preamble junk 1\n2,99\n".getBytes)
    val over = lake.sql(s"SELECT * FROM read_csv('$dir/short.csv', skip=5)")
    assert(over.columns.toSeq == Seq("column0"), over.columns.mkString(","))
    assert(over.count() == 0L)
    val eq = lake.sql(s"SELECT * FROM read_csv('$dir/short.csv', skip=2)")
    assert(eq.columns.toSeq == Seq("column0") && eq.count() == 0L)
    // one line left after skip: still reads normally
    val one = lake.sql(s"SELECT * FROM read_csv('$dir/short.csv', skip=1)")
      .collect()
    assert(one.length == 1 && one.head.getLong(0) == 2L
      && one.head.getLong(1) == 99L)
  }

  test("read_csv ignore_errors drops rows whose cells fail a pinned " +
      "types= conversion (DuckDB-measured row-drop, not a loud cast)") {
    val dir = Files.createTempDirectory("graft_r18ig").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.csv"),
      "a,b\n1,x\nzz,y\n3,z\n".getBytes)
    val got = lake.sql(s"SELECT * FROM read_csv('$dir/bad.csv', " +
      "types={'a':'INTEGER'}, ignore_errors=true) ORDER BY a").collect()
    assert(got.map(r => s"${r.get(0)},${r.get(1)}").toSeq ==
      Seq("1,x", "3,z"), got.mkString("|"))
    // same with a nullstr list in play (the custom-sniff path)
    val got2 = lake.sql(s"SELECT * FROM read_csv('$dir/bad.csv', " +
      "types={'a':'INTEGER'}, ignore_errors=true, nullstr=['NA','none']) " +
      "ORDER BY a").collect()
    assert(got2.map(r => s"${r.get(0)},${r.get(1)}").toSeq ==
      Seq("1,x", "3,z"), got2.mkString("|"))
  }

  test("named-window refusals are loud: dup names, cannot-override, " +
      "cannot-copy-frame, cross-scope references (DuckDB-measured)") {
    val t = "(VALUES (1),(2),(3)) t(x)"
    def refuse(q: String, frag: String): Unit = {
      val e = intercept[Exception](lake.sql(q).collect())
      assert(e.getMessage != null && e.getMessage.contains(frag),
        s"$q -> ${e.getMessage}")
    }
    // duplicate name in one clause (DuckDB: window "w" is already defined)
    refuse(s"SELECT sum(x) OVER w FROM $t WINDOW w AS (ORDER BY x), " +
      "w AS (PARTITION BY x)", "already defined")
    // duplicate name ACROSS set-op branches (measured: same error)
    refuse(s"SELECT sum(x) OVER (w ROWS UNBOUNDED PRECEDING) AS s FROM $t " +
      s"WINDOW w AS (ORDER BY x) UNION ALL SELECT sum(x) OVER " +
      s"(w ROWS UNBOUNDED PRECEDING) FROM $t WINDOW w AS (ORDER BY x DESC)",
      "already defined")
    // child ORDER BY over a base that has one
    refuse(s"SELECT first_value(x) OVER (w ORDER BY x) FROM $t " +
      "WINDOW w AS (ORDER BY x DESC)", "override ORDER BY")
    refuse(s"SELECT first_value(x) OVER w2 FROM $t WINDOW " +
      "w1 AS (ORDER BY x DESC), w2 AS (w1 ORDER BY x)", "override ORDER BY")
    // child PARTITION BY over a base that has one
    refuse(s"SELECT sum(x) OVER (w PARTITION BY x) FROM $t " +
      "WINDOW w AS (PARTITION BY x%2)", "override PARTITION BY")
    // copying a window that has its own frame clause
    refuse(s"SELECT sum(x) OVER (w ROWS UNBOUNDED PRECEDING) FROM $t " +
      "WINDOW w AS (ORDER BY x ROWS 1 PRECEDING)", "frame clause")
    refuse(s"SELECT sum(x) OVER w2 FROM $t WINDOW " +
      "w1 AS (ORDER BY x ROWS 1 PRECEDING), w2 AS (w1)", "frame clause")
    // a subquery's OVER cannot see the OUTER clause's name (measured:
    // DuckDB refuses; the old rewrite silently captured the outer spec)
    refuse(s"SELECT (SELECT sum(y) OVER (w ROWS UNBOUNDED PRECEDING) " +
      s"FROM (VALUES (5)) s(y)), sum(x) OVER w FROM $t " +
      "WINDOW w AS (ORDER BY x)", "does not exist")
    // an outer OVER cannot see a subquery's clause
    refuse("SELECT a, sum(a) OVER (w ROWS UNBOUNDED PRECEDING) FROM " +
      s"(SELECT sum(x) OVER (w ROWS UNBOUNDED PRECEDING) AS a FROM $t " +
      "WINDOW w AS (ORDER BY x)) q", "does not exist")
  }

  test("self-referential window def terminates with DuckDB's identity-" +
      "copy semantics (the r17 inliner hung here)") {
    val got = lake.sql("SELECT sum(x) OVER (w ROWS UNBOUNDED PRECEDING) " +
      "AS s FROM (VALUES (1),(2)) t(x) WINDOW w AS (w ORDER BY x) ORDER BY 1")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L), got)
  }
}
