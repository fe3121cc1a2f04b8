package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** r16 ADVICE closure — every expected value/error below is MEASURED on
  * real DuckDB 1.0.0 (r17 probe session):
  *
  *  1. bitstring_agg(x, lo, hi) raises DuckDB's Out of Range error for a
  *     value outside [lo, hi] (the old rewrite silently marked '0') and
  *     answers NULL over all-NULL input (old: all-zero string).
  *  2. first/last(v ORDER BY k) honor DuckDB's NULLS-LAST default: the
  *     NULL-key row is the LAST row in both ASC and DESC order (old
  *     max_by/min_by rewrite skipped NULL keys entirely).
  *  3. quantile/quantile_disc/quantile_cont accept fractions in [-1, 1]
  *     with negatives counting from the upper end; out-of-range, NULL,
  *     and mixed-sign lists raise DuckDB's Binder errors (old: clamped
  *     or AIOOBE).
  *  4. map_concat with differing key/value types across arguments is a
  *     loud analysis error (old: silently misread entries with the
  *     first map's types).
  */
class R17EdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val lake: DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("graft_r17edge").toString
    val l = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    l.sql("CREATE TABLE kv(k INTEGER, v INTEGER)")
    l.sql("INSERT INTO kv VALUES (1,10),(2,20),(NULL,30)")
    l
  }

  test("bitstring_agg raises Out of Range outside [lo, hi]; NULL over " +
      "all-NULL input (DuckDB-measured)") {
    // in-range still answers the measured carrier string
    assert(lake.sql(
      "SELECT bitstring_agg(x, 2, 5) AS b FROM (VALUES (3),(NULL)) t(x)")
      .head().getString(0) == "0100")
    // value above hi: DuckDB "Value 7 is outside of provided min and max
    // range (2 <-> 5)"
    val eHi = intercept[Exception] {
      lake.sql("SELECT bitstring_agg(x, 2, 5) AS b FROM (VALUES (3),(7)) t(x)")
        .collect()
    }
    assert(eHi.getMessage.contains("Value 7 is outside of provided min and max range (2 <-> 5)"),
      eHi.getMessage)
    // value below lo reports the offending MIN value
    val eLo = intercept[Exception] {
      lake.sql("SELECT bitstring_agg(x, 2, 5) AS b FROM (VALUES (1),(3)) t(x)")
        .collect()
    }
    assert(eLo.getMessage.contains("Value 1 is outside of provided min and max range (2 <-> 5)"),
      eLo.getMessage)
    // all-NULL input answers NULL, not '0000'
    assert(lake.sql(
      "SELECT bitstring_agg(x, 2, 5) AS b FROM (VALUES (CAST(NULL AS INTEGER))) t(x)")
      .head().isNullAt(0))
  }

  test("first/last(v ORDER BY k) place NULL keys LAST in both directions " +
      "(DuckDB-measured)") {
    // ASC: first = min-key v, last = NULL-key v (measured 10 / 30)
    val asc = lake.sql(
      "SELECT first(v ORDER BY k) AS f, last(v ORDER BY k) AS l FROM kv").head()
    assert(asc.getInt(0) == 10 && asc.getInt(1) == 30)
    // DESC: first = max-key v, last = STILL the NULL-key v (measured 20 / 30)
    val desc = lake.sql(
      "SELECT first(v ORDER BY k DESC) AS f, last(v ORDER BY k DESC) AS l FROM kv")
      .head()
    assert(desc.getInt(0) == 20 && desc.getInt(1) == 30)
    // NULL v on an interior key rides along (measured first=10, last=30)
    val nv = lake.sql(
      "SELECT first(v ORDER BY k) AS f, last(v ORDER BY k) AS l " +
      "FROM (VALUES (1,10),(3,NULL),(NULL,30)) t(k,v)").head()
    assert(nv.getInt(0) == 10 && nv.getInt(1) == 30)
    // VARCHAR keys, DESC (measured first=2, last=3)
    val s = lake.sql(
      "SELECT first(v ORDER BY g DESC) AS f, last(v ORDER BY g DESC) AS l " +
      "FROM (VALUES ('a',1),('c',2),(NULL,3)) t(g,v)").head()
    assert(s.getInt(0) == 2 && s.getInt(1) == 3)
  }

  test("quantile family: negative fractions count from the upper end; " +
      "out-of-range / NULL / mixed signs refuse loudly (DuckDB-measured)") {
    def q1(sql: String): Any = lake.sql(sql).head().get(0)
    val four = "FROM (VALUES (1),(2),(3),(4)) t(x)"
    // disc negatives over 4 rows: -1.0->1, -0.75->2, -0.5->3, -0.25->4, -0.1->4
    assert(q1(s"SELECT quantile_disc(x, -1.0) AS q $four") == 1)
    assert(q1(s"SELECT quantile_disc(x, -0.75) AS q $four") == 2)
    assert(q1(s"SELECT quantile_disc(x, -0.5) AS q $four") == 3)
    assert(q1(s"SELECT quantile_disc(x, -0.25) AS q $four") == 4)
    assert(q1(s"SELECT quantile_disc(x, -0.1) AS q $four") == 4)
    assert(q1("SELECT quantile_disc(x, -0.5) AS q FROM (VALUES (1),(2)) t(x)") == 2)
    // cont negative == cont(1+q) (measured -0.25 -> 3.25, -0.5 -> 2.5)
    assert(q1(s"SELECT quantile_cont(x, -0.25) AS q $four") == 3.25d)
    assert(q1(s"SELECT quantile_cont(x, -0.5) AS q $four") == 2.5d)
    // DECIMAL cont negative keeps the exact-interpolate-then-truncate
    // path (measured 2.00 over (1.25, 2.75) at -0.5)
    assert(q1("SELECT quantile_cont(d, -0.5) AS q FROM (VALUES (1.25),(2.75)) t(d)")
      .toString == "2.00")
    // out-of-range / NULL / mixed-sign list: DuckDB's Binder messages
    val eRange = intercept[Exception] {
      lake.sql("SELECT quantile_disc(x, 1.5) AS q FROM (VALUES (1),(2)) t(x)").collect()
    }
    assert(eRange.getMessage.contains("QUANTILE can only take parameters in the range [-1, 1]"),
      eRange.getMessage)
    val eNull = intercept[Exception] {
      lake.sql("SELECT quantile_disc(x, NULL) AS q FROM (VALUES (1),(2)) t(x)").collect()
    }
    assert(eNull.getMessage.contains("QUANTILE argument must not be NULL"),
      eNull.getMessage)
    val eMix = intercept[Exception] {
      lake.sql(s"SELECT quantile_disc(x, [-0.5, 0.5]) AS q $four").collect()
    }
    assert(eMix.getMessage.contains("QUANTILE parameters must have consistent signs"),
      eMix.getMessage)
    // consistent-sign negative list still expands per element
    assert(q1(s"SELECT quantile_disc(x, [-0.75, -0.25]) AS q $four")
      .asInstanceOf[scala.collection.Seq[_]].toSeq == Seq(2, 4))
  }

  test("named-window inheritance: OVER (w ROWS ...) and w2 AS (w1 ...) " +
      "extend the base spec (DuckDB-measured)") {
    // measured: sum over w+frame = [1,3,5]
    val r1 = lake.sql(
      "SELECT x, sum(x) OVER (w ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s " +
      "FROM (VALUES (1),(2),(3)) t(x) WINDOW w AS (ORDER BY x) ORDER BY x")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(r1 == Seq((1, 1L), (2, 3L), (3, 5L)), r1)
    // def-level inheritance: w2 extends w1 (measured rank 1,2; sum 1,3)
    val r2 = lake.sql(
      "SELECT x, rank() OVER w1 AS rk, sum(x) OVER w2 AS s " +
      "FROM (VALUES (1),(2)) t(x) " +
      "WINDOW w1 AS (ORDER BY x), w2 AS (w1 ROWS UNBOUNDED PRECEDING) ORDER BY x")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(r2 == Seq((1, 1, 1L), (2, 2, 3L)), r2)
  }

  test("PIVOT over a derived table (subquery form) matches DuckDB") {
    // measured: PIVOT (VALUES…) ON k USING sum(v) GROUP BY g
    //   -> rows ('a',1,2),('b',3,NULL) with columns g,x,y
    val rows = lake.sql(
      "PIVOT (SELECT * FROM (VALUES ('a','x',1),('a','y',2),('b','x',3)) " +
      "t(g,k,v)) ON k USING sum(v) GROUP BY g ORDER BY g").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows(0).getLong(1) == 1L && rows(0).getLong(2) == 2L)
    assert(rows(1).getLong(1) == 3L && rows(1).isNullAt(2))
    // IN-list form pins the pivot columns explicitly: absent values
    // yield all-NULL columns (measured ('a',1,NULL),('b',NULL,NULL))
    val inRows = lake.sql(
      "PIVOT (SELECT * FROM (VALUES ('a','x',1),('b','z',3)) t(g,k,v)) " +
      "ON k IN ('x','y') USING sum(v) GROUP BY g ORDER BY g").collect()
    assert(inRows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(inRows(0).getLong(1) == 1L && inRows(0).isNullAt(2))
    assert(inRows(1).isNullAt(1) && inRows(1).isNullAt(2))
    // multi-agg USING names columns <value>_<alias> (measured x_s, x_c)
    val ma = lake.sql(
      "PIVOT (SELECT * FROM (VALUES ('a','x',1),('a','x',5)) t(g,k,v)) " +
      "ON k USING sum(v) AS s, count(*) AS c GROUP BY g")
    assert(ma.columns.toSeq == Seq("g", "x_s", "x_c"), ma.columns.mkString(","))
    val mr = ma.head()
    assert(mr.getLong(1) == 6L && mr.getLong(2) == 2L)
  }

  test("COPY FROM honors NULLSTR lists and FORCE_NOT_NULL; COPY TO " +
      "refuses them (DuckDB-measured)") {
    val dir = Files.createTempDirectory("graft_r17cf").toString
    lake.sql("CREATE TABLE cf(id INTEGER, c VARCHAR)")
    lake.sql(s"COPY (SELECT 'id,c' || chr(10) || '1,NA' || chr(10) || " +
      s"'2,x' || chr(10) || '3,none' AS j) TO '$dir/cf.csv' " +
      "(FORMAT CSV, QUOTE '', HEADER false)")
    lake.sql(s"COPY cf FROM '$dir/cf.csv' (FORMAT CSV, HEADER true, " +
      "NULLSTR ['NA','none'])")
    assert(lake.sql("SELECT coalesce(c, 'None') AS c FROM cf ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("None", "x", "None"))
    lake.sql("DELETE FROM cf")
    lake.sql(s"COPY cf FROM '$dir/cf.csv' (FORMAT CSV, HEADER true, " +
      "NULLSTR 'NA', FORCE_NOT_NULL (c))")
    // measured: the NA match reads back '' in the forced column
    assert(lake.sql("SELECT '[' || c || ']' AS c FROM cf ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("[]", "[x]", "[none]"))
    val e = intercept[Exception] {
      lake.sql(s"COPY cf TO '$dir/out.csv' (FORMAT CSV, NULLSTR ['a','b'])")
    }
    assert(e.getMessage.contains("only accepts one nullstr value"), e.getMessage)
  }

  test("ordered collectors place NULL keys LAST in both directions " +
      "(list DESC was the r16-pinned divergence — now fixed; DuckDB-measured)") {
    // list(v ORDER BY k DESC) over keys 1,2,NULL = [20, 10, 30]
    val l = lake.sql("SELECT list(v ORDER BY k DESC) AS l FROM kv").head()
      .getSeq[Int](0)
    assert(l == Seq(20, 10, 30), l)
    assert(lake.sql("SELECT list(v ORDER BY k) AS l FROM kv").head()
      .getSeq[Int](0) == Seq(10, 20, 30))
    // string_agg: ASC 'a,b,c' (NULL last — Spark's WITHIN GROUP default
    // would answer 'c,a,b'), DESC 'b,a,c', multi-key 'a,b,c'
    def sa(q: String) = lake.sql(q).head().getString(0)
    assert(sa("SELECT string_agg(v, ',' ORDER BY k) AS s " +
      "FROM (VALUES (1,'a'),(2,'b'),(NULL,'c')) t(k,v)") == "a,b,c")
    assert(sa("SELECT string_agg(v, ',' ORDER BY k DESC) AS s " +
      "FROM (VALUES (1,'a'),(2,'b'),(NULL,'c')) t(k,v)") == "b,a,c")
    assert(sa("SELECT string_agg(v, ',' ORDER BY g, k DESC) AS s " +
      "FROM (VALUES (1,1,'a'),(1,NULL,'b'),(NULL,2,'c')) t(g,k,v)") == "a,b,c")
  }

  test("multi-statement script atomicity matches DuckDB: statements " +
      "BEFORE the failure persist, statements after never run") {
    // measured r17: DuckDB autocommits per statement — a failing script
    // keeps the earlier statements' effects and stops at the failure
    lake.sql("CREATE TABLE at1(x INTEGER)")
    intercept[Exception] {
      lake.sql("INSERT INTO at1 VALUES (1); INSERT INTO at1 VALUES ('xx'); " +
        "INSERT INTO at1 VALUES (3)")
    }
    assert(lake.sql("SELECT x FROM at1 ORDER BY 1").collect()
      .map(_.getInt(0)).toSeq == Seq(1))
    // a failure inside an OPEN transaction discards the transaction's
    // writes back to the BEGIN snapshot (DuckDB's aborted transaction is
    // never durably committed; transactions here are script-scoped —
    // the documented divergence from the reference's persistent
    // connection)
    intercept[Exception] {
      lake.sql("BEGIN; INSERT INTO at1 VALUES (10); INSERT INTO at1 VALUES ('yy')")
    }
    assert(lake.sql("SELECT x FROM at1 ORDER BY 1").collect()
      .map(_.getInt(0)).toSeq == Seq(1))
  }

  test("map_concat refuses differing key/value types across arguments " +
      "(DuckDB-measured message)") {
    val eV = intercept[Exception] {
      lake.sql("SELECT map_concat(MAP{'a': 1}, MAP{'b': 'x'}) AS m").collect()
    }
    assert(eV.getMessage.contains("'value' type of map differs between arguments"),
      eV.getMessage)
    val eK = intercept[Exception] {
      lake.sql("SELECT map_concat(MAP{'a': 1}, MAP{1: 2}) AS m").collect()
    }
    assert(eK.getMessage.contains("type of map differs between arguments"),
      eK.getMessage)
    // same types still concat (last-wins, first-seen key order) and a
    // NULL map argument is still skipped
    val ok = lake.sql(
      "SELECT map_concat(MAP{'a': 1, 'b': 2}, MAP{'b': 9, 'c': 3}) AS m")
      .head().getMap[String, Int](0)
    assert(ok == Map("a" -> 1, "b" -> 9, "c" -> 3))
    assert(lake.sql("SELECT map_concat(MAP{'a': 1}, NULL) AS m")
      .head().getMap[String, Int](0) == Map("a" -> 1))
  }
}
