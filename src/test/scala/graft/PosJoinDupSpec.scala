package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** r13: POSITIONAL JOIN with same-named sides — DuckDB keeps the
  * duplicate output names (measured: `l(v) POSITIONAL JOIN r(v)` yields
  * columns `v, v` pairing rows by position; uneven lengths NULL-pad).
  * Later unqualified references to the duplicated name stay a loud
  * binder error, same as DuckDB.
  */
class PosJoinDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("POSITIONAL JOIN with same-named sides keeps duplicate names") {
    val dir = Files.createTempDirectory("graft_posdup").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql(
      """CREATE TABLE pj(v INTEGER);
        |INSERT INTO pj VALUES (1),(2)""".stripMargin)
    val df = lake.sql("SELECT * FROM pj POSITIONAL JOIN pj t2")
    assert(df.columns.toSeq == Seq("v", "v"))
    assert(df.collect().map(_.toSeq.toList).toList == List(List(1, 1), List(2, 2)))
  }

  test("uneven same-named sides NULL-pad like DuckDB") {
    val dir = Files.createTempDirectory("graft_posdup2").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql(
      """CREATE TABLE pa(v INTEGER);
        |INSERT INTO pa VALUES (1),(2),(3);
        |CREATE TABLE pb(v INTEGER);
        |INSERT INTO pb VALUES (10)""".stripMargin)
    val df = lake.sql(
      "SELECT * FROM (SELECT v FROM pa ORDER BY v) a POSITIONAL JOIN (SELECT v FROM pb) b")
    assert(df.columns.toSeq == Seq("v", "v"))
    assert(df.collect().map(_.toSeq.toList).toList ==
      List(List(1, 10), List(2, null), List(3, null)))
  }
}
