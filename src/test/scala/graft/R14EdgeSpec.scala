package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** r14 gap-probe closures: DuckDB's trailing-comma tolerance (select
  * lists, list/struct literals, VALUES rows — the keyword set is
  * DuckDB-reserved, so a bare identifier can never be swallowed) and
  * the short UNPIVOT forms (subquery target, optional INTO with the
  * measured default output names name/value).
  */
class R14EdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("trailing commas + short UNPIVOT forms match DuckDB") {
    val dir = Files.createTempDirectory("graft_r14edge").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql("CREATE TABLE t(g VARCHAR, x INTEGER)")
    lake.sql("INSERT INTO t VALUES ('a',1),('a',2),('b',3)")
    assert(lake.sql("SELECT 1 AS a, 2 AS b,").head().toSeq == Seq(1, 2))
    assert(lake.sql("SELECT x, FROM t WHERE x > 2").head().getInt(0) == 3)
    assert(lake.sql("SELECT [1, 2,] AS l").head().getSeq[Int](0) == Seq(1, 2))
    lake.sql("INSERT INTO t VALUES ('c', 4,)")
    assert(lake.sql("SELECT count(*) AS n FROM t").head().getLong(0) == 4L)
    // short UNPIVOT: subquery target, default (name, value) outputs
    val u1 = lake.sql("UNPIVOT (SELECT 1 AS a, 2 AS b) ON a, b")
    assert(u1.columns.toSeq == Seq("name", "value"))
    assert(u1.collect().map(_.toSeq).toSeq == Seq(Seq("a", 1), Seq("b", 2)))
    val u2 = lake.sql("UNPIVOT t ON x")
    assert(u2.columns.toSeq == Seq("g", "name", "value"))
    assert(u2.count() == 4L)
    // a named INTO on the subquery form keeps the user's names
    assert(lake.sql("UNPIVOT (SELECT 1 AS a) ON a INTO NAME k VALUE v")
      .columns.toSeq == Seq("k", "v"))
  }
}
