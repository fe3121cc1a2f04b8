package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Double-quoted identifiers (r14 gap probe): DuckDB's `"..."` is
  * ALWAYS an identifier (strings are single-quoted) — the session pins
  * spark.sql.ansi.doubleQuotedIdentifiers, the DDL splitter takes
  * quoted names containing whitespace, synthesized SQL backticks
  * non-plain names, and pushed V1 filters arrive pre-backticked from
  * Spark's quoteIfNeeded. End-to-end over the lake: create, insert,
  * filter (pushdown path), arithmetic, DESCRIBE, UPDATE, reopen.
  */
class QuotedIdentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("quoted identifiers with spaces work end-to-end") {
    val dir = Files.createTempDirectory("graft_qid").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql("CREATE TABLE qt(\"my col\" INTEGER, plain VARCHAR)")
    lake.sql("INSERT INTO qt VALUES (1, 'a'), (2, 'b')")
    assert(lake.sql("SELECT \"my col\" FROM qt ORDER BY \"my col\"")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(lake.sql("SELECT \"my col\" + 1 AS x FROM qt WHERE \"my col\" > 1")
      .head().getInt(0) == 3)
    val desc = lake.sql("DESCRIBE qt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("my col") == "INTEGER", desc)
    lake.sql("UPDATE qt SET \"my col\" = 9 WHERE plain = 'a'")
    assert(lake.sql("SELECT \"my col\" FROM qt ORDER BY 1")
      .collect().map(_.getInt(0)).toSeq == Seq(2, 9))
    // subquery alias with a quoted spaced column
    assert(lake.sql("SELECT \"weird name\" AS x FROM (SELECT 5 AS \"weird name\") q")
      .head().getInt(0) == 5)
    // reopen: the name survives the xlsx round-trip
    val lake2 = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    assert(lake2.sql("SELECT sum(\"my col\") AS s FROM qt").head().getLong(0) == 11L)
  }
}
