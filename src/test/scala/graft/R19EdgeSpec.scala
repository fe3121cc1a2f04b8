package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** r18 ADVICE closure — every expected value/error MEASURED on real
  * DuckDB 1.0.0 (r19 probe session):
  *
  *  1. range()/generate_series()/unnest() in comma/JOIN TABLE positions
  *     (`FROM t, range(3)` / `CROSS JOIN range(3)`) are derived tables
  *     with DuckDB's column naming (old: the list-valued select rewrite
  *     captured them and resolution failed).
  *  2. A mixed-sign interval step (INTERVAL '1 month -31 days') into a
  *     timestamp range is DuckDB's LOUD "Interval with mix of
  *     negative/positive entries not supported" (old: classified
  *     forward by lexicographic sign, the calendar loop never advanced
  *     and allocated until OOM).
  *  3. list_aggregate(l, 'any_value') answers the first NON-NULL
  *     element ([NULL,2] -> 2) while 'first' keeps the NULL.
  *  4. Nested indexed lambdas reusing the index name: the inner lambda
  *     SHADOWS the outer parameter, so only the inner 1-basing applies
  *     (old: both passes incremented — a 2-based inner index).
  *  5. An unnest nested inside another unnest's argument is DuckDB's
  *     loud binder error (old: overlapping splices corrupted the query
  *     text).
  */
class R19EdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val lake: DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("graft_r19edge").toString
    new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
  }

  private def vals(q: String): String =
    lake.sql(q).collect().map(r =>
      Option(r.get(0)).map(_.toString).getOrElse("None")).mkString(";")

  test("TVFs in comma/JOIN table positions (DuckDB-measured)") {
    assert(vals("SELECT CAST(t.x + r.range AS VARCHAR) AS v " +
      "FROM (SELECT 10 AS x) t, range(3) r ORDER BY 1") == "10;11;12")
    assert(vals("SELECT CAST(r.range AS VARCHAR) AS v " +
      "FROM (SELECT 1) t CROSS JOIN range(3) r ORDER BY 1") == "0;1;2")
    assert(vals("SELECT CAST(g.generate_series AS VARCHAR) AS v " +
      "FROM (SELECT 1) t, generate_series(1,3) g ORDER BY 1") == "1;2;3")
    assert(vals("SELECT CAST(x AS VARCHAR) AS v " +
      "FROM (SELECT 1) s, unnest([7,8]) t(x) ORDER BY 1") == "7;8")
    // expression positions keep the LIST semantics
    assert(vals("SELECT CAST(range(3) AS VARCHAR) AS v") == "[0, 1, 2]")
    // DuckDB's concat STRINGIFIES list arguments (measured) — range()
    // here is expression position even though a FROM follows later
    assert(vals("SELECT CAST(f AS VARCHAR) AS v FROM (SELECT " +
      "concat(range(2), range(1)) AS f)") == "[0, 1][0]")
  }

  test("mixed-sign interval step refuses loudly instead of looping " +
      "(DuckDB: Interval with mix of negative/positive entries)") {
    val e = intercept[Throwable] {
      lake.sql("SELECT range(TIMESTAMP '2020-01-01', " +
        "TIMESTAMP '2020-06-01', INTERVAL '1 month -31 days')").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("mix of negative/positive")),
      msgs(e).mkString(" | "))
  }

  test("list_aggregate any_value skips NULLs; first keeps them " +
      "(DuckDB-measured)") {
    assert(vals("SELECT CAST(list_aggregate([NULL, 2, 3], 'any_value') " +
      "AS VARCHAR) AS v") == "2")
    assert(vals("SELECT list_aggregate(['a', NULL, 'b'], 'any_value') " +
      "AS v") == "a")
    assert(vals("SELECT coalesce(CAST(list_aggregate([NULL, 2, 3], " +
      "'first') AS VARCHAR), 'None') AS v") == "None")
    assert(vals("SELECT coalesce(CAST(list_aggregate([NULL::INT], " +
      "'any_value') AS VARCHAR), 'None') AS v") == "None")
  }

  test("nested index lambdas shadow the outer parameter " +
      "(DuckDB-measured)") {
    assert(vals("SELECT CAST(list_transform([1,2], (x,i) -> " +
      "list_transform([10], (y,i) -> i)) AS VARCHAR) AS v")
      == "[[1], [1]]")
    // non-shadowing inner lambda still reads the OUTER 1-based index
    assert(vals("SELECT CAST(list_transform([3,4], (x,i) -> " +
      "list_transform([9], y -> i)) AS VARCHAR) AS v") == "[[1], [2]]")
    // bare single-param inner lambda rebinding the name
    assert(vals("SELECT CAST(list_transform([1,2], (x,i) -> " +
      "list_transform([5,6], i -> i*10)) AS VARCHAR) AS v")
      == "[[50, 60], [50, 60]]")
    // shadowed index inside an aggregate argument
    assert(vals("SELECT CAST(list_transform([1,2], (x,i) -> i + " +
      "list_aggregate(list_transform([5,6],(y,i)->y+i), 'sum')) " +
      "AS VARCHAR) AS v") == "[15, 16]")
  }

  test("nested unnest calls refuse loudly in BOTH engines " +
      "(DuckDB binder error)") {
    for (q <- Seq(
        "SELECT unnest(unnest([[1,2],[3]]))",
        "SELECT unnest([1,2,3] || unnest([[1],[2]]))")) {
      val e = intercept[Throwable](lake.sql(q).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("Nested UNNEST")),
        q + " -> " + msgs(e).mkString(" | "))
    }
  }
}
