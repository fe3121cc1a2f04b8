package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Differential date/time barrage (r12): 80 generated expressions over
  * strftime / date_part / date_trunc / date_diff / date_sub / age /
  * last_day / dayname / monthname / yearweek / time_bucket / date and
  * interval arithmetic, each evaluated by REAL DuckDB 1.0 offline
  * (seeded generator) and replayed through the dialect router with the
  * result CAST to VARCHAR on both sides — so the compare covers VALUES
  * and the rendered TYPE (a date_trunc that returns midnight-timestamp
  * where DuckDB returns DATE fails the string compare).
  */
class DateDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fixtures: Seq[(String, String)] = Seq(
      ("DATE '2004-07-21' + -451", "2003-04-27"),
      ("date_part('microseconds', TIMESTAMP '2001-06-19 01:58:32')", "32000000"),
      ("date_diff('year', DATE '2000-07-14', DATE '1999-04-03')", "-1"),
      ("age(TIMESTAMP '2022-01-27 18:07:14', TIMESTAMP '1998-10-19 12:03:14')", "23 years 3 months 8 days 06:04:00"),
      ("strftime(TIMESTAMP '2030-03-10 13:09:34', '%Y-%m-%d')", "2030-03-10"),
      ("date_sub('day', TIMESTAMP '2030-11-06 03:37:36', TIMESTAMP '2007-06-04 17:45:04')", "-8555"),
      ("date_sub('year', TIMESTAMP '2008-08-22 17:27:49', TIMESTAMP '2015-08-19 14:23:19')", "6"),
      ("date_diff('month', DATE '2010-02-19', DATE '2014-09-16')", "55"),
      ("extract(week FROM TIMESTAMP '2023-05-20 02:07:32')", "20"),
      ("DATE '2005-06-05' - DATE '2026-07-02'", "-7697"),
      ("dayname(DATE '1999-09-19')", "Sunday"),
      ("yearweek(DATE '2015-06-23')", "201526"),
      ("DATE '2026-10-26' + -33", "2026-09-23"),
      ("date_part('day', TIMESTAMP '2012-08-23 21:04:03')", "23"),
      ("monthname(DATE '2014-11-19')", "November"),
      ("dayname(DATE '2023-05-23')", "Tuesday"),
      ("DATE '2017-01-15' - DATE '2017-03-20'", "-64"),
      ("date_part('dow', TIMESTAMP '1998-04-25 09:08:47')", "6"),
      ("date_diff('minute', DATE '2020-08-03', DATE '2005-08-13')", "-7875360"),
      ("age(TIMESTAMP '2012-03-27 13:55:35', TIMESTAMP '2012-12-14 11:43:56')", "-8 months -17 days -21:48:21"),
      ("DATE '2009-03-03' - DATE '2006-03-08'", "1091"),
      ("dayname(DATE '2009-01-16')", "Friday"),
      ("time_bucket(INTERVAL '1 week', TIMESTAMP '2006-05-10 00:09:26')", "2006-05-08 00:00:00"),
      ("age(TIMESTAMP '2018-10-19 10:08:44', TIMESTAMP '2027-10-21 21:47:03')", "-9 years -2 days -11:38:19"),
      ("TIMESTAMP '2030-07-13 12:25:06' + INTERVAL '62 seconds'", "2030-07-13 12:26:08"),
      ("strftime(TIMESTAMP '2007-02-07 14:10:07', '%Y-%m-%d %H:%M:%S')", "2007-02-07 14:10:07"),
      ("date_sub('year', TIMESTAMP '2001-01-19 04:34:06', TIMESTAMP '2018-10-01 02:55:13')", "17"),
      ("date_sub('minute', TIMESTAMP '2004-11-09 11:38:23', TIMESTAMP '2025-02-04 15:29:30')", "10644711"),
      ("TIMESTAMP '2014-02-05 03:47:21' + INTERVAL '34 seconds'", "2014-02-05 03:47:55"),
      ("time_bucket(INTERVAL '1 month', TIMESTAMP '2005-09-01 06:33:23')", "2005-09-01 00:00:00"),
      ("date_trunc('year', TIMESTAMP '2028-05-21 02:44:54')", "2028-01-01"),
      ("last_day(DATE '2028-06-06')", "2028-06-30"),
      ("DATE '2009-09-18' + 297", "2010-07-12"),
      ("age(TIMESTAMP '2016-11-08 19:51:50', TIMESTAMP '2007-04-27 12:47:51')", "9 years 6 months 11 days 07:03:59"),
      ("date_diff('week', DATE '2028-08-12', DATE '1996-01-26')", "-1698"),
      ("last_day(DATE '2025-05-07')", "2025-05-31"),
      ("monthname(DATE '2017-08-26')", "August"),
      ("extract(yearweek FROM TIMESTAMP '2018-02-08 03:14:30')", "201806"),
      ("date_diff('hour', DATE '2008-08-20', DATE '1995-08-21')", "-113952"),
      ("DATE '2000-11-04' + 431", "2002-01-09"),
      ("DATE '2007-08-06' - DATE '2022-11-11'", "-5576"),
      ("date_part('decade', TIMESTAMP '2024-07-24 02:46:10')", "202"),
      ("date_trunc('month', TIMESTAMP '1996-03-19 14:51:41')", "1996-03-01"),
      ("date_trunc('second', TIMESTAMP '2017-03-18 17:08:01')", "2017-03-18 17:08:01"),
      ("strftime(TIMESTAMP '2001-09-24 04:27:55', '%d/%m/%Y')", "24/09/2001"),
      ("time_bucket(INTERVAL '1 hour', TIMESTAMP '1996-05-07 09:32:15')", "1996-05-07 09:00:00"),
      ("yearweek(DATE '2015-05-18')", "201521"),
      ("DATE '2003-01-24' - DATE '2017-08-22'", "-5324"),
      ("date_sub('minute', TIMESTAMP '2027-03-18 04:33:32', TIMESTAMP '1996-08-25 05:38:00')", "-16073215"),
      ("yearweek(DATE '2004-03-05')", "200410"),
      ("TIMESTAMP '2002-09-02 10:43:33' + INTERVAL '68 seconds'", "2002-09-02 10:44:41"),
      ("yearweek(DATE '2001-09-02')", "200135"),
      ("date_diff('week', DATE '2012-01-25', DATE '2001-09-15')", "-541"),
      ("age(TIMESTAMP '1996-02-15 10:39:32', TIMESTAMP '2027-04-23 08:28:32')", "-31 years -2 months -7 days -21:49:00"),
      ("age(TIMESTAMP '2025-09-08 22:33:56', TIMESTAMP '2011-09-07 14:08:26')", "14 years 1 day 08:25:30"),
      ("date_part('decade', TIMESTAMP '2023-06-03 21:15:27')", "202"),
      ("date_part('hour', TIMESTAMP '2014-02-25 04:45:41')", "4"),
      ("dayname(DATE '2018-03-09')", "Friday"),
      ("extract(dayofyear FROM TIMESTAMP '2024-04-24 03:25:56')", "115"),
      ("TIMESTAMP '2005-11-27 07:10:45' + INTERVAL '56 seconds'", "2005-11-27 07:11:41"),
      ("DATE '2021-04-12' + -174", "2020-10-20"),
      ("date_part('yearweek', TIMESTAMP '1996-06-18 14:28:45')", "199625"),
      ("strftime(TIMESTAMP '2019-06-17 19:18:32', '%Y-%m-%d')", "2019-06-17"),
      ("date_part('minute', TIMESTAMP '2001-02-09 08:02:57')", "2"),
      ("yearweek(DATE '2006-05-25')", "200621"),
      ("date_trunc('minute', TIMESTAMP '2011-07-05 17:58:32')", "2011-07-05 17:58:00"),
      ("date_sub('second', TIMESTAMP '2015-02-09 01:51:44', TIMESTAMP '2006-07-03 08:01:40')", "-271533004"),
      ("date_part('second', TIMESTAMP '2000-10-28 07:04:16')", "16"),
      ("time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-01-11 17:26:59')", "2024-01-11 17:15:00"),
      ("extract(second FROM TIMESTAMP '2003-01-17 22:15:07')", "7"),
      ("date_trunc('day', TIMESTAMP '1998-03-07 09:40:19')", "1998-03-07"),
      ("age(TIMESTAMP '2008-05-15 16:43:11', TIMESTAMP '2012-06-26 00:16:02')", "-4 years -1 month -10 days -07:32:51"),
      ("strftime(TIMESTAMP '1996-12-17 17:12:32', '%A %B %d')", "Tuesday December 17"),
      ("date_diff('second', DATE '2001-11-27', DATE '2022-11-16')", "661737600"),
      ("age(TIMESTAMP '2020-09-10 22:13:14', TIMESTAMP '2016-04-27 22:46:40')", "4 years 4 months 12 days 23:26:34"),
      ("date_trunc('minute', TIMESTAMP '2017-01-27 04:00:04')", "2017-01-27 04:00:00"),
      ("dayname(DATE '2011-07-06')", "Wednesday"),
      ("strftime(TIMESTAMP '2000-11-27 12:55:32', '%H:%M')", "12:55"),
      ("last_day(DATE '2010-12-10')", "2010-12-31"),
      ("strftime(TIMESTAMP '2024-03-06 08:28:00', '%Y-%m-%d %H:%M:%S')", "2024-03-06 08:28:00"),
      ("DATE '2016-09-11' + -250", "2016-01-05"),
      ("strftime(TIMESTAMP '2014-04-12 05:00:21', '%A %B %d')", "Saturday April 12"),
      ("date_part('dow', TIMESTAMP '2012-09-21 06:15:32')", "5"),
      ("yearweek(DATE '1995-02-09')", "199506"),
      ("time_bucket(INTERVAL '15 minutes', TIMESTAMP '2004-07-19 01:25:01')", "2004-07-19 01:15:00"),
      ("last_day(DATE '2014-11-08')", "2014-11-30"),
      ("date_part('milliseconds', TIMESTAMP '2004-11-23 19:24:48')", "48000"),
      ("DATE '2026-03-10' + 241", "2026-11-06"),
      ("date_sub('month', TIMESTAMP '1997-12-17 20:27:46', TIMESTAMP '2027-03-17 16:36:53')", "350"),
      ("time_bucket(INTERVAL '15 minutes', TIMESTAMP '2009-02-01 01:08:40')", "2009-02-01 01:00:00"),
      ("DATE '2001-07-27' + -38", "2001-06-19"),
      ("age(TIMESTAMP '1998-11-01 20:34:43', TIMESTAMP '2010-08-09 00:29:51')", "-11 years -9 months -7 days -03:55:08"),
      ("date_part('milliseconds', TIMESTAMP '2029-02-22 16:04:47')", "47000"),
      ("monthname(DATE '2025-05-26')", "May"),
      ("date_part('second', TIMESTAMP '2010-12-25 06:14:47')", "47"),
      ("dayname(DATE '2024-08-28')", "Wednesday"),
      ("DATE '1999-08-22' - DATE '2013-01-20'", "-4900"),
      ("dayname(DATE '2007-02-20')", "Tuesday"),
      ("date_trunc('hour', TIMESTAMP '2011-11-24 22:19:39')", "2011-11-24 22:00:00"),
      ("date_sub('month', TIMESTAMP '1995-08-02 15:17:43', TIMESTAMP '2001-12-07 21:31:18')", "76")
  )

  test("100 DuckDB-evaluated date/time expressions match through the router") {
    val dir = Files.createTempDirectory("graft_datediff").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    val bad = fixtures.flatMap { case (expr, expected) =>
      try {
        val got = lake.sql(s"SELECT CAST(($expr) AS VARCHAR) AS v").head().getString(0)
        if (got == expected) None
        else Some(s"$expr: got '$got', DuckDB says '$expected'")
      } catch { case e: Throwable =>
        Some(s"$expr FAILED: ${e.getMessage.linesIterator.take(1).mkString.take(90)}") }
    }
    assert(bad.isEmpty, s"${bad.size} mismatches:\n" + bad.mkString("\n"))
  }
}
