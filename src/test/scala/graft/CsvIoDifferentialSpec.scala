package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Differential CSV COPY round-trip barrage (r14 VERDICT item 6, third
  * family): `COPY (...) TO '<path>' (FORMAT CSV, ...)` followed by a
  * `read_csv('<path>', ...)` read-back of quoting/escape edge values —
  * embedded delimiters, embedded/edge quotes, single-quote-as-quote-char,
  * custom escape, newlines inside fields, NULLSTR vs empty string,
  * unicode, padding, headerless positional names, and typed (int /
  * double / date / timestamp / bool) render round-trips. Each fixture is
  * a two-statement script; the round-trip must recover the original
  * logical values in EACH engine independently (DuckDB truth computed by
  * tools/diffgen.py gen csvio, which performs the same COPY+read in real
  * DuckDB 1.0.0). NULL renders as None. Do not edit values by hand.
  */
class CsvIoDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fixtures: Seq[(String, String)] = Seq(
      ("COPY (SELECT 1 AS id, 'abc' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f00.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f00.csv', all_varchar=true) ORDER BY 1", "1=abc;2=z2"),
      ("COPY (SELECT 1 AS id, 'a,b' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f01.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f01.csv', all_varchar=true) ORDER BY 1", "1=a,b;2=z2"),
      ("COPY (SELECT 1 AS id, 'say \"hi\"' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f02.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f02.csv', all_varchar=true) ORDER BY 1", "1=say \"hi\";2=z2"),
      ("COPY (SELECT 1 AS id, 'it''s' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f03.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f03.csv', all_varchar=true) ORDER BY 1", "1=it's;2=z2"),
      ("COPY (SELECT 1 AS id, 'l1' || chr(10) || 'l2' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f04.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f04.csv', all_varchar=true) ORDER BY 1", "1=l1\nl2;2=z2"),
      ("COPY (SELECT 1 AS id, 'l1' || chr(13) || chr(10) || 'l2' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f05.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f05.csv', all_varchar=true) ORDER BY 1", "1=l1\r\nl2;2=z2"),
      ("COPY (SELECT 1 AS id, 'back\\slash' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f06.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f06.csv', all_varchar=true) ORDER BY 1", "1=back\\slash;2=z2"),
      ("COPY (SELECT 1 AS id, '  padded  ' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f07.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f07.csv', all_varchar=true) ORDER BY 1", "1=  padded  ;2=z2"),
      ("COPY (SELECT 1 AS id, 'héß👍' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f08.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f08.csv', all_varchar=true) ORDER BY 1", "1=héß👍;2=z2"),
      ("COPY (SELECT 1 AS id, '\"quoted\"' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f09.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f09.csv', all_varchar=true) ORDER BY 1", "1=\"quoted\";2=z2"),
      ("COPY (SELECT 1 AS id, '' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f10.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f10.csv', all_varchar=true) ORDER BY 1", "1=None;2=z2"),
      ("COPY (SELECT 1 AS id, CAST(NULL AS VARCHAR) AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f11.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f11.csv', all_varchar=true) ORDER BY 1", "1=None;2=z2"),
      ("COPY (SELECT 1 AS id, 'tab\there' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f12.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f12.csv', all_varchar=true) ORDER BY 1", "1=tab\there;2=z2"),
      ("COPY (SELECT 1 AS id, 'a|b' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f13.csv' (FORMAT CSV, DELIMITER '|'); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f13.csv', delim='|', all_varchar=true) ORDER BY 1", "1=a|b;2=z2"),
      ("COPY (SELECT 1 AS id, 'a;b' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f14.csv' (FORMAT CSV, DELIMITER ';'); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f14.csv', delim=';', all_varchar=true) ORDER BY 1", "1=a;b;2=z2"),
      ("COPY (SELECT 1 AS id, 'x,y' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f15.csv' (FORMAT CSV, DELIMITER ',', QUOTE ''''); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f15.csv', quote='''', all_varchar=true) ORDER BY 1", "1=x,y;2=z2"),
      ("COPY (SELECT 1 AS id, 'don''t,stop' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f16.csv' (FORMAT CSV, QUOTE ''''); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f16.csv', quote='''', all_varchar=true) ORDER BY 1", "1=don't,stop;2=z2"),
      ("COPY (SELECT 1 AS id, 'esc\"me,too' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f17.csv' (FORMAT CSV, ESCAPE '\\'); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f17.csv', escape='\\', all_varchar=true) ORDER BY 1", "1=esc\"me,too;2=z2"),
      ("COPY (SELECT 1 AS id, 'a\"b' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f18.csv' (FORMAT CSV, QUOTE '\"', ESCAPE '\"'); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f18.csv', quote='\"', escape='\"', all_varchar=true) ORDER BY 1", "1=a\"b;2=z2"),
      ("COPY (SELECT 1 AS id, 'nullish' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f19.csv' (FORMAT CSV, NULLSTR 'nullish'); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f19.csv', nullstr='nullish', all_varchar=true) ORDER BY 1", "1=None;2=z2"),
      ("COPY (SELECT 1 AS id, 'NA' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f20.csv' (FORMAT CSV, NULLSTR 'NA'); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f20.csv', nullstr='NA', all_varchar=true) ORDER BY 1", "1=None;2=z2"),
      ("COPY (SELECT 1 AS id, CAST(NULL AS VARCHAR) AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f21.csv' (FORMAT CSV, NULLSTR 'NA'); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f21.csv', nullstr='NA', all_varchar=true) ORDER BY 1", "1=None;2=z2"),
      ("COPY (SELECT 1 AS id, 'hdr' AS c UNION ALL SELECT 2, 'z2') TO '/tmp/graft_csvio/f22.csv' (FORMAT CSV, HEADER true); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/f22.csv', header=true, all_varchar=true) ORDER BY 1", "1=hdr;2=z2"),
      ("COPY (SELECT 1 AS id, 42 AS c UNION ALL SELECT 2, -7) TO '/tmp/graft_csvio/t00.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/t00.csv') ORDER BY 1", "1=42;2=-7"),
      ("COPY (SELECT 1 AS id, 1.5 AS c UNION ALL SELECT 2, -0.25) TO '/tmp/graft_csvio/t01.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/t01.csv') ORDER BY 1", "1=1.5;2=-0.25"),
      ("COPY (SELECT 1 AS id, DATE '2024-02-29' AS c UNION ALL SELECT 2, DATE '1999-12-31') TO '/tmp/graft_csvio/t02.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/t02.csv') ORDER BY 1", "1=2024-02-29;2=1999-12-31"),
      ("COPY (SELECT 1 AS id, TIMESTAMP '2024-02-29 01:02:03' AS c UNION ALL SELECT 2, TIMESTAMP '1999-12-31 23:59:59') TO '/tmp/graft_csvio/t03.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/t03.csv') ORDER BY 1", "1=2024-02-29 01:02:03;2=1999-12-31 23:59:59"),
      ("COPY (SELECT 1 AS id, true AS c UNION ALL SELECT 2, false) TO '/tmp/graft_csvio/t04.csv' (FORMAT CSV); SELECT CAST(id AS VARCHAR) || '=' || coalesce(CAST(c AS VARCHAR), 'None') FROM read_csv('/tmp/graft_csvio/t04.csv') ORDER BY 1", "1=true;2=false"),
      ("COPY (SELECT 'only' AS id, 'v' AS c) TO '/tmp/graft_csvio/h0.csv' (FORMAT CSV, HEADER false); SELECT CAST(column0 AS VARCHAR) || '=' || CAST(column1 AS VARCHAR) FROM read_csv('/tmp/graft_csvio/h0.csv', header=false, all_varchar=true)", "only=v"))

  test("29 DuckDB-evaluated CSV COPY round-trips match through the router") {
    val dir = Files.createTempDirectory("graft_csvio").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    val bad = fixtures.flatMap { case (script, expected) =>
      try {
        val got = lake.sql(script).collect().map(r =>
          Option(r.getString(0)).getOrElse("None")).mkString(";")
        if (got == expected) None
        else Some(s"${script.take(110)}...: got '$got', DuckDB says '$expected'")
      } catch { case e: Throwable =>
        Some(s"${script.take(110)}... FAILED: ${e.getMessage.linesIterator.take(1).mkString.take(120)}") }
    }
    assert(bad.isEmpty, s"${bad.size} mismatches:\n" + bad.mkString("\n"))
  }
}
