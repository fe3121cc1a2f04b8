package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** r15 ADVICE closure: trailing commas are tolerated / refused per the
  * MEASURED DuckDB 1.0.0 context matrix, not before any ')'. Tolerated:
  * select list, GROUP BY list, SET list, IN lists, VALUES rows, list /
  * struct literals, row(), alias column lists. Refused (both engines
  * parser-error): function-call argument lists, bare row constructors,
  * ORDER BY / PARTITION BY lists, scalar clause tails.
  */
class R15EdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val lake: DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("graft_r15edge").toString
    val l = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    l.sql("CREATE TABLE t(g VARCHAR, x INTEGER)")
    l.sql("INSERT INTO t VALUES ('a',1),('a',2),('b',3)")
    l
  }

  test("trailing commas tolerated exactly where DuckDB tolerates them") {
    // select list (mid-statement + end of input), GROUP BY list
    assert(lake.sql("SELECT g, FROM t WHERE x = 3").head().getString(0) == "b")
    assert(lake.sql("SELECT 7 AS a, 8 AS b,").head().toSeq == Seq(7, 8))
    assert(lake.sql("SELECT g FROM t GROUP BY g, ORDER BY g")
      .collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(lake.sql("SELECT g FROM t GROUP BY g,").count() == 2L)
    // IN list, VALUES rows (incl. trailing row separator), literals
    assert(lake.sql("SELECT count(*) AS n FROM t WHERE x IN (1, 3,)")
      .head().getLong(0) == 2L)
    assert(lake.sql("VALUES (1, 2,), (3, 4,),").count() == 2L)
    assert(lake.sql("SELECT [1, 2,] AS l").head().getSeq[Int](0) == Seq(1, 2))
    assert(lake.sql("SELECT {'a': 1,} AS s").head().getStruct(0).getInt(0) == 1)
    assert(lake.sql("SELECT row(1, 2,) AS r").head().getStruct(0).getInt(1) == 2)
    // alias column lists: derived table and CTE (incl. second CTE in a list)
    assert(lake.sql("SELECT x FROM (VALUES (1, 2)) v(x, y,)")
      .head().getInt(0) == 1)
    assert(lake.sql("WITH c(x,) AS (SELECT 1) SELECT * FROM c")
      .head().getInt(0) == 1)
    assert(lake.sql(
      "WITH a(x) AS (SELECT 1), b(y,) AS (SELECT 2) SELECT x + y AS s FROM a, b")
      .head().getInt(0) == 3)
    // UPDATE SET list tolerates a trailing comma before WHERE
    lake.sql("UPDATE t SET x = 9, WHERE g = 'b'")
    assert(lake.sql("SELECT x FROM t WHERE g = 'b'").head().getInt(0) == 9)
    // subquery select list directly before the closing paren
    assert(lake.sql("SELECT (SELECT 42,) AS v").head().getInt(0) == 42)
  }

  test("COLLATE / ILIKE hardening: CASE arms, qualified columns, concat " +
      "patterns, ORDER BY on columns (codegen path) — DuckDB-matched") {
    lake.sql("CREATE TABLE hard(n VARCHAR, k VARCHAR)")
    lake.sql("INSERT INTO hard VALUES ('Ada','x'),('bob','y'),('CARL','z'),('ß-stra','w')")
    def one(q: String) = lake.sql(q).collect().map(_.getString(0)).toSeq
    // comparison inside a CASE arm (expected values measured on DuckDB)
    assert(one("SELECT k FROM hard WHERE CASE WHEN n = 'ADA' COLLATE NOCASE " +
      "THEN 1 ELSE 0 END = 1") == Seq("x"))
    // qualified column operand
    assert(one("SELECT k FROM hard WHERE hard.n = 'carl' COLLATE NOCASE") == Seq("z"))
    // ILIKE pattern extends over || (concat binds tighter — measured)
    assert(lake.sql("SELECT CAST('ab' ILIKE 'A' || 'B' AS VARCHAR) AS v")
      .head().getString(0) == "true")
    // NOT ILIKE inside an AND chain; plain parenthesized ILIKE
    assert(one("SELECT k FROM hard WHERE 1 = 1 AND n NOT ILIKE 'a%' ORDER BY k")
      == Seq("w", "y", "z"))
    assert(one("SELECT k FROM hard WHERE (n ILIKE 'b%')") == Seq("y"))
    // column pattern (non-literal rhs)
    assert(one("SELECT k FROM hard WHERE n ILIKE k || '%'") == Seq())
    // upper() over a COLUMN — the DuckCase codegen path, not constant
    // folding; ß upper-cases to ẞ (simple fold), never SS
    assert(one("SELECT string_agg(upper(n), ',' ORDER BY n) FROM hard")
      == Seq("ADA,CARL,BOB,ẞ-STRA"))
    // ORDER BY a COLUMN with NOCASE (tie-free)
    assert(one("SELECT n FROM hard ORDER BY n COLLATE NOCASE LIMIT 2")
      == Seq("Ada", "bob"))
  }

  test("lake dialect confs are scoped per call, not session-pinned") {
    // force lake construction + a lake statement first
    assert(lake.sql("SELECT \"g\" FROM t WHERE x = 1").count() >= 0)
    // outside any lake call the session keeps stock Spark semantics:
    // double quotes are string literals again ...
    assert(spark.sql("SELECT \"hi\" AS s").head().getString(0) == "hi")
    // ... and decimal arithmetic is back to default precision-loss mode
    // (D(38,10)+D(38,10) reduces to 9 fraction digits in stock Spark;
    // the lake path keeps DuckDB's 10)
    val stock = spark.sql(
      "SELECT CAST(CAST(1.1 AS DECIMAL(38,10)) + CAST(2.2 AS DECIMAL(38,10)) AS STRING) AS v")
      .head().getString(0)
    assert(stock == "3.300000000")
    val lakeV = lake.sql(
      "SELECT CAST(CAST(1.1 AS DECIMAL(38,10)) + CAST(2.2 AS DECIMAL(38,10)) AS VARCHAR) AS v")
      .head().getString(0)
    assert(lakeV == "3.3000000000")
  }

  test("trailing commas refused where DuckDB parser-errors") {
    // function-call argument lists — DuckDB: syntax error at or near ')'
    intercept[Exception](lake.sql("SELECT count(g,) FROM t").collect())
    intercept[Exception](lake.sql("SELECT greatest(1, 2,) AS v").collect())
    // bare row constructor
    intercept[Exception](lake.sql("SELECT (1, 2,) AS r").collect())
    // ORDER BY list: end of input and before LIMIT
    intercept[Exception](lake.sql("SELECT g FROM t ORDER BY g,").collect())
    intercept[Exception](
      lake.sql("SELECT g FROM t ORDER BY g, LIMIT 1").collect())
    // PARTITION BY / ORDER BY inside OVER
    intercept[Exception](lake.sql(
      "SELECT sum(x) OVER (PARTITION BY g, ORDER BY x) AS s FROM t").collect())
    // scalar clause tails
    intercept[Exception](lake.sql("SELECT g FROM t WHERE g = 'a',").collect())
    intercept[Exception](lake.sql("SELECT g FROM t LIMIT 1,").collect())
    // CASE arm
    intercept[Exception](lake.sql(
      "SELECT CASE WHEN x = 1, THEN 1 END AS c FROM t").collect())
  }
}
