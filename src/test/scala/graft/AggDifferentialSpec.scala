package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Differential aggregate barrage (r12): 42 aggregate spellings over a
  * fixed 14-row VALUES table, each evaluated per-group by REAL DuckDB
  * 1.0 offline (seeded) and replayed through the dialect router with
  * the result CAST to VARCHAR — the compare covers VALUES and rendered
  * TYPES (a DECIMAL avg where DuckDB says DOUBLE fails the string
  * compare). Covers avg/sum/min/max/count, moments, median/mode,
  * quantiles, regr_*, bit/bool aggregates, arg_max/min, geomean,
  * product, entropy, mad, string_agg, FILTER and DISTINCT forms.
  */
class AggDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val table =
    "(VALUES (0, 'a', 8, 4.59), (1, 'c', 4, 2.27), (2, 'a', 20, 2.22), (3, 'c', 0, 2.56), (4, 'a', 20, -2.97), (5, 'b', 13, 1.71), (6, 'a', 20, 5.26), (7, 'a', 17, -2.53), (8, 'c', 19, 6.63), (9, 'c', 9, -2.63), (10, 'b', 12, 2.47), (11, 'a', 15, 7.47), (12, 'b', -5, -1.3), (13, 'a', -2, 5.89)) t(id, g, i, d)"

  private val fixtures: Seq[(String, String)] = Seq(
      ("avg(i)", "a=14.0;b=6.666666666666667;c=8.0"),
      ("avg(d)", "a=2.847142857142857;b=0.96;c=2.2075"),
      ("sum(i)", "a=98;b=20;c=32"),
      ("sum(d)", "a=19.93;b=2.88;c=8.83"),
      ("min(d)", "a=-2.97;b=-1.30;c=-2.63"),
      ("max(d)", "a=7.47;b=2.47;c=6.63"),
      ("count(*)", "a=7;b=3;c=4"),
      ("count(d)", "a=7;b=3;c=4"),
      ("stddev(d)", "a=4.13592679773113;b=1.993765282073093;c=3.7898141994914036"),
      ("stddev_pop(d)", "a=3.8291241605274036;b=1.6279025359850836;c=3.282075372382542"),
      ("var_samp(d)", "a=17.105890476190474;b=3.9750999999999994;c=14.362691666666668"),
      ("median(i)", "a=17.0;b=12.0;c=6.5"),
      ("median(d)", "a=4.59;b=1.71;c=2.27"),
      ("mode(g)", "a=a;b=b;c=c"),
      ("corr(i, d)", "a=-0.4623290132311755;b=0.9710486442769141;c=0.43668351149875867"),
      ("covar_pop(i, d)", "a=-13.54857142857143;b=13.056666666666665;c=10.184999999999999"),
      ("skewness(d)", "a=-0.680248875002426;b=-1.4532391054649827;c=-0.3265578738196224"),
      ("kurtosis(d)", "a=-1.3063744252757752;b=None;c=1.530464567738803"),
      ("geomean(abs(d) + 1)", "a=5.11936027242405;b=2.78617805496803;c=4.2374757748325695"),
      ("product(1 + d/100)", "a=1.2111797465992231;b=1.0286734791899996;c=1.0890074412798674"),
      ("bit_and(i + 7)", "a=0;b=0;c=0"),
      ("bit_or(i + 7)", "a=31;b=23;c=31"),
      ("bit_xor(i + 7)", "a=31;b=5;c=6"),
      ("bool_and(i > 0)", "a=false;b=false;c=false"),
      ("bool_or(d > 7)", "a=true;b=false;c=false"),
      ("arg_max(g, d)", "a=a;b=b;c=c"),
      ("arg_min(g, i)", "a=a;b=b;c=c"),
      ("quantile_cont(d, 0.25)", "a=-0.15;b=0.20;c=1.04"),
      ("quantile_disc(i, 0.5)", "a=17;b=12;c=4"),
      ("regr_slope(d, i)", "a=-0.23131707317073166;b=0.19138436482084686;c=0.20168316831683167"),
      ("regr_intercept(d, i)", "a=6.0855818815331;b=-0.31589576547231246;c=0.5940346534653471"),
      ("regr_r2(d, i)", "a=0.21374811647531233;b=0.9429354695520328;c=0.1906924892148865"),
      ("entropy(g)", "a=0.0;b=0.0;c=0.0"),
      ("mad(d)", "a=2.37;b=0.76;c=2.18"),
      ("approx_count_distinct(g)", "a=1;b=1;c=1"),
      ("string_agg(g, '|' ORDER BY id)", "a=a|a|a|a|a|a|a;b=b|b|b;c=c|c|c|c"),
      ("first(g ORDER BY id)", "a=a;b=b;c=c"),
      ("last(g ORDER BY id)", "a=a;b=b;c=c"),
      ("avg(i) FILTER (i > 2)", "a=16.666666666666668;b=12.5;c=10.666666666666666"),
      ("sum(d) FILTER (g = 'a')", "a=19.93;b=None;c=None"),
      ("count(DISTINCT g)", "a=1;b=1;c=1"),
      ("sum(DISTINCT i)", "a=58;b=20;c=32")
  )

  test("42 DuckDB-evaluated aggregates match per group through the router") {
    val dir = Files.createTempDirectory("graft_aggdiff").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    // per-group compare: doubles at 1e-12 RELATIVE tolerance (moment
    // aggregates accumulate in a different order than DuckDB's serial
    // scan, so the last ulp wanders); everything else string-exact.
    // 'None'/'null' both mean SQL NULL.
    def same(g: String, e: String): Boolean = {
      if ((g == "null" || g == "None") && (e == "null" || e == "None")) return true
      if (g == e) return true
      (g.toDoubleOption, e.toDoubleOption) match {
        case (Some(gd), Some(ed)) =>
          math.abs(gd - ed) <= math.max(1e-12 * math.abs(ed), 1e-14)
        case _ => false
      }
    }
    val bad = fixtures.flatMap { case (agg, expected) =>
      try {
        val rows = lake.sql(
          s"SELECT g, CAST(($agg) AS VARCHAR) AS v FROM $table GROUP BY g ORDER BY g")
          .collect()
        val got = rows.map(r => s"${r.getString(0)}=${
          if (r.isNullAt(1)) "None" else r.getString(1)}").mkString(";")
        val gs = got.split(';'); val es = expected.split(';')
        val ok = gs.length == es.length && gs.zip(es).forall { case (gp, ep) =>
          val (gk, gv) = gp.span(_ != '='); val (ek, ev) = ep.span(_ != '=')
          gk == ek && same(gv.drop(1), ev.drop(1))
        }
        if (ok) None else Some(s"$agg: got '$got', DuckDB says '$expected'")
      } catch { case e: Throwable =>
        Some(s"$agg FAILED: ${e.getMessage.linesIterator.take(1).mkString.take(90)}") }
    }
    assert(bad.isEmpty, s"${bad.size} mismatches:\n" + bad.mkString("\n"))
  }
}
