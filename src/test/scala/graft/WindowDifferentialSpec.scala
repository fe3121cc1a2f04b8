package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Differential window barrage (r12): 27 window expressions — ranking
  * family, ntile bucketing, lag/lead with explicit defaults,
  * first/last/nth_value with default and explicit frames, running and
  * sliding ROWS/RANGE aggregates, and the r12 natives (median /
  * quantile_disc / mad / avg) AS WINDOW FUNCTIONS — evaluated per-row
  * by REAL DuckDB 1.0 offline and replayed through the router. Doubles
  * compare at 1e-12 relative tolerance; everything else exact.
  */
class WindowDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val table =
    "(VALUES (0, 'b', 1), (1, 'b', 8), (2, 'b', 9), (3, 'b', 4), (4, 'b', 6), (5, 'a', 6), (6, 'a', 1), (7, 'a', 4), (8, 'b', 8), (9, 'a', 5), (10, 'b', 3), (11, 'a', 8)) t(id, g, v)"

  private val fixtures: Seq[(String, String)] = Seq(
      ("row_number() OVER (PARTITION BY g ORDER BY v, id)", "0=1;1=5;2=7;3=3;4=4;5=4;6=1;7=2;8=6;9=3;10=2;11=5"),
      ("rank() OVER (PARTITION BY g ORDER BY v)", "0=1;1=5;2=7;3=3;4=4;5=4;6=1;7=2;8=5;9=3;10=2;11=5"),
      ("dense_rank() OVER (PARTITION BY g ORDER BY v)", "0=1;1=5;2=6;3=3;4=4;5=4;6=1;7=2;8=5;9=3;10=2;11=5"),
      ("percent_rank() OVER (PARTITION BY g ORDER BY v)", "0=0.0;1=0.6666666666666666;2=1.0;3=0.3333333333333333;4=0.5;5=0.75;6=0.0;7=0.25;8=0.6666666666666666;9=0.5;10=0.16666666666666666;11=1.0"),
      ("cume_dist() OVER (PARTITION BY g ORDER BY v)", "0=0.14285714285714285;1=0.8571428571428571;2=1.0;3=0.42857142857142855;4=0.5714285714285714;5=0.8;6=0.2;7=0.4;8=0.8571428571428571;9=0.6;10=0.2857142857142857;11=1.0"),
      ("ntile(3) OVER (PARTITION BY g ORDER BY v, id)", "0=1;1=2;2=3;3=1;4=2;5=2;6=1;7=1;8=3;9=2;10=1;11=3"),
      ("ntile(4) OVER (ORDER BY v, id)", "0=1;1=3;2=4;3=2;4=3;5=3;6=1;7=2;8=4;9=2;10=1;11=4"),
      ("lag(v) OVER (PARTITION BY g ORDER BY id)", "0=None;1=1;2=8;3=9;4=4;5=None;6=6;7=1;8=6;9=4;10=8;11=5"),
      ("lag(v, 2, -1) OVER (PARTITION BY g ORDER BY id)", "0=-1;1=-1;2=1;3=8;4=9;5=-1;6=-1;7=6;8=4;9=1;10=6;11=4"),
      ("lead(v, 1, 99) OVER (PARTITION BY g ORDER BY id)", "0=8;1=9;2=4;3=6;4=8;5=1;6=4;7=5;8=3;9=8;10=99;11=99"),
      ("first_value(v) OVER (PARTITION BY g ORDER BY id)", "0=1;1=1;2=1;3=1;4=1;5=6;6=6;7=6;8=1;9=6;10=1;11=6"),
      ("last_value(v) OVER (PARTITION BY g ORDER BY id)", "0=1;1=8;2=9;3=4;4=6;5=6;6=1;7=4;8=8;9=5;10=3;11=8"),
      ("last_value(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)", "0=3;1=3;2=3;3=3;4=3;5=8;6=8;7=8;8=3;9=8;10=3;11=8"),
      ("nth_value(v, 2) OVER (PARTITION BY g ORDER BY id)", "0=None;1=8;2=8;3=8;4=8;5=None;6=1;7=1;8=8;9=1;10=8;11=1"),
      ("sum(v) OVER (PARTITION BY g ORDER BY id)", "0=1;1=9;2=18;3=22;4=28;5=6;6=7;7=11;8=36;9=16;10=39;11=24"),
      ("sum(v) OVER (PARTITION BY g ORDER BY v)", "0=1;1=30;2=39;3=8;4=14;5=16;6=1;7=5;8=30;9=10;10=4;11=24"),
      ("sum(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)", "0=9;1=18;2=21;3=19;4=18;5=7;6=11;7=10;8=17;9=17;10=11;11=13"),
      ("sum(v) OVER (PARTITION BY g ORDER BY v RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)", "0=1;1=25;2=25;3=7;4=6;5=11;6=1;7=9;8=25;9=15;10=7;11=8"),
      ("avg(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", "0=1.0;1=4.5;2=6.0;3=7.0;4=6.333333333333333;5=6.0;6=3.5;7=3.6666666666666665;8=6.0;9=3.3333333333333335;10=5.666666666666667;11=5.666666666666667"),
      ("count(*) OVER (PARTITION BY g)", "0=7;1=7;2=7;3=7;4=7;5=5;6=5;7=5;8=7;9=5;10=7;11=5"),
      ("min(v) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", "0=1;1=1;2=1;3=1;4=1;5=1;6=1;7=1;8=1;9=1;10=1;11=1"),
      ("max(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)", "0=9;1=9;2=9;3=8;4=8;5=8;6=8;7=8;8=8;9=8;10=3;11=8"),
      ("sum(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING)", "0=17;1=13;2=10;3=14;4=11;5=5;6=9;7=13;8=3;9=8;10=None;11=None"),
      ("median(v) OVER (PARTITION BY g)", "0=6.0;1=6.0;2=6.0;3=6.0;4=6.0;5=5.0;6=5.0;7=5.0;8=6.0;9=5.0;10=6.0;11=5.0"),
      ("quantile_disc(v, 0.5) OVER (PARTITION BY g)", "0=6;1=6;2=6;3=6;4=6;5=5;6=5;7=5;8=6;9=5;10=6;11=5"),
      ("mad(v) OVER (PARTITION BY g)", "0=2.0;1=2.0;2=2.0;3=2.0;4=2.0;5=1.0;6=1.0;7=1.0;8=2.0;9=1.0;10=2.0;11=1.0"),
      ("avg(v) OVER (PARTITION BY g)", "0=5.571428571428571;1=5.571428571428571;2=5.571428571428571;3=5.571428571428571;4=5.571428571428571;5=4.8;6=4.8;7=4.8;8=5.571428571428571;9=4.8;10=5.571428571428571;11=4.8")
  )

  test("27 DuckDB-evaluated window expressions match per row through the router") {
    val dir = Files.createTempDirectory("graft_windiff").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    def same(g: String, e: String): Boolean = {
      if ((g == "null" || g == "None") && (e == "null" || e == "None")) return true
      if (g == e) return true
      (g.toDoubleOption, e.toDoubleOption) match {
        case (Some(gd), Some(ed)) =>
          math.abs(gd - ed) <= math.max(1e-12 * math.abs(ed), 1e-14)
        case _ => false
      }
    }
    val bad = fixtures.flatMap { case (w, expected) =>
      try {
        val rows = lake.sql(
          s"SELECT id, CAST(($w) AS VARCHAR) AS x FROM $table ORDER BY id").collect()
        val got = rows.map(r => s"${r.getInt(0)}=${
          if (r.isNullAt(1)) "None" else r.getString(1)}").mkString(";")
        val gs = got.split(';'); val es = expected.split(';')
        val ok = gs.length == es.length && gs.zip(es).forall { case (gp, ep) =>
          val (gk, gv) = gp.span(_ != '='); val (ek, ev) = ep.span(_ != '=')
          gk == ek && same(gv.drop(1), ev.drop(1))
        }
        if (ok) None else Some(s"$w: got '$got', DuckDB says '$expected'")
      } catch { case e: Throwable =>
        Some(s"$w FAILED: ${e.getMessage.linesIterator.take(1).mkString.take(90)}") }
    }
    assert(bad.isEmpty, s"${bad.size} mismatches:\n" + bad.mkString("\n"))
  }
}
