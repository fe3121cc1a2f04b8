package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Round-12 advice closures: DEFAULT expression capture in column
  * definitions (lone NULL is a valid default; a function call whose
  * arguments contain constraint keywords — `coalesce(NULL, 7)` — must
  * not be truncated at the keyword inside its parens), matching
  * DuckDB's accepted DDL (ducklakexl.py:394 passes DDL through).
  */
class R12EdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshLake(): DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("graft_r12_edge").toString
    new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
  }

  test("DEFAULT NULL parses as a valid default expression") {
    val lake = freshLake()
    lake.sql("CREATE TABLE dn(id INTEGER, v VARCHAR DEFAULT NULL)")
    lake.sql("INSERT INTO dn(id) VALUES (1)")
    val r = lake.sql("SELECT id, v FROM dn").head()
    assert(r.getInt(0) == 1 && r.isNullAt(1))
    // and DEFAULT NULL followed by another constraint still splits there
    lake.sql("CREATE TABLE dn2(id INTEGER, q INTEGER DEFAULT NULL CHECK (q IS NULL OR q > 0))")
    lake.sql("INSERT INTO dn2(id) VALUES (1)")
    assert(lake.sql("SELECT q FROM dn2").head().isNullAt(0))
    val e = intercept[Exception] { lake.sql("INSERT INTO dn2 VALUES (2, -5)") }
    assert(e.getMessage != null)
  }

  test("DEFAULT with keyword-bearing call arguments parses whole") {
    val lake = freshLake()
    lake.sql("CREATE TABLE dc(id INTEGER, v INTEGER DEFAULT coalesce(NULL, 7))")
    lake.sql("INSERT INTO dc(id) VALUES (1)")
    assert(lake.sql("SELECT v FROM dc").head().getInt(0) == 7)
    // keyword inside parens + a REAL trailing constraint after the call
    lake.sql("CREATE TABLE dc2(id INTEGER, v INTEGER DEFAULT coalesce(NULL, 7) NOT NULL)")
    lake.sql("INSERT INTO dc2(id) VALUES (2)")
    assert(lake.sql("SELECT v FROM dc2").head().getInt(0) == 7)
    intercept[Exception] { lake.sql("INSERT INTO dc2 VALUES (3, NULL)") }
  }

  test("ROLLBACK undoes TEMP tables and prepared statements too") {
    val lake = freshLake()
    lake.sql("CREATE TABLE rt(id INTEGER); INSERT INTO rt VALUES (1),(2)")
    lake.sql("CREATE TEMP TABLE keepme AS SELECT id FROM rt WHERE id = 1")
    lake.sql("PREPARE keptstmt AS SELECT count(*) AS c FROM rt")
    lake.sql(
      """BEGIN;
        |CREATE TEMP TABLE txntemp AS SELECT id FROM rt;
        |CREATE OR REPLACE TEMP TABLE keepme AS SELECT id FROM rt WHERE id = 2;
        |PREPARE txnstmt AS SELECT 1 AS one;
        |ROLLBACK""".stripMargin)
    // txn-created temp + prepared are gone (DuckDB: temp schema and
    // PREPARE are transactional)
    assertThrows[Exception] { lake.sql("SELECT * FROM txntemp") }
    assertThrows[Exception] { lake.sql("EXECUTE txnstmt") }
    // txn-replaced temp resolves to its pre-BEGIN content again
    assert(lake.sql("SELECT id FROM keepme").head().getInt(0) == 1)
    // pre-txn prepared statement still works
    assert(lake.sql("EXECUTE keptstmt").head().getLong(0) == 2L)
  }

  test("INTERVAL columns: canonical text carrier, DML, reopen, loud bad input") {
    val lake = freshLake()
    lake.sql("CREATE TABLE iv2(id INTEGER, iv INTERVAL)")
    lake.sql("INSERT INTO iv2 VALUES (1, INTERVAL '2 days'), (2, '90 seconds')")
    // UPDATE coerces through the same canonical renderer
    lake.sql("UPDATE iv2 SET iv = INTERVAL '3 hours' WHERE id = 2")
    val rows = lake.sql("SELECT id, iv FROM iv2 ORDER BY id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("2 days", "03:00:00"))
    // the catalog keeps the logical identity across the workbook trip
    val re = new DuckLakeXLSpark(spark, lake.excelPath, lake.dataPath)
    val desc = re.sql("DESCRIBE iv2").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("iv") == "INTERVAL", desc.toString)
    assert(re.sql("SELECT iv FROM iv2 WHERE id = 1").head().getString(0) == "2 days")
    // an unparseable interval string fails LOUDLY, not as a silent zero
    val e = intercept[Exception] {
      lake.sql("INSERT INTO iv2 VALUES (3, 'not an interval')")
    }
    assert(e.getMessage != null)
    // a numeric cell cannot silently become an interval
    assertThrows[Exception] { lake.sql("INSERT INTO iv2 VALUES (4, 17)") }
  }

  test("r12 review fixes: // and ^ precedence, trim nesting, interval fractions, subscripts") {
    val lake = freshLake()
    def one(q: String): Any = lake.sql(q).head().get(0)
    // `//` is left-associative at multiplicative precedence (measured:
    // 100 // 7 // 2 = 7, not the rightmost-first 33) and chains with
    // * / % on the left, tighter-binding ** on the right
    assert(one("SELECT 100 // 7 // 2 AS v") == 7L)
    assert(one("SELECT 5 * 7 // 2 AS v") == 17L)
    assert(one("SELECT 7 // 2 * 5 AS v") == 15L)
    assert(one("SELECT 2 + 3 * 4 // 5 AS v") == 4L)
    assert(one("SELECT (1+5) // 2 // 2 AS v") == 1L)
    assert(one("SELECT round(100 // 3 ** 2, 4) AS v") == 11.1111)
    assert(one("SELECT 2 ** 3 // 2 AS v") == 4.0)
    // `::` casts bind tighter than // and ^
    assert(one("SELECT 7.5::DOUBLE // 2 AS v") == 3.75)
    assert(one("SELECT 2::DOUBLE ^ 3 AS v") == 8.0)
    assert(lake.sql("SELECT NULL // 2 AS v").head().isNullAt(0))
    // `^`/`**` are LEFT-associative (measured: 2 ^ 3 ^ 2 = 64, the old
    // rightmost-first scan built the right-associative 512)
    assert(one("SELECT 2 ^ 3 ^ 2 AS v") == 64.0)
    assert(one("SELECT 2 ** 3 ** 2 AS v") == 64.0)
    // a 2-arg trim nested inside another trim's arguments still rewrites
    assert(one("SELECT trim(trim('xxabcxx','x'), 'a') AS v") == "bc")
    // interval fractions cascade like DuckDB instead of rounding:
    // day/week fraction -> exact time; month fraction -> whole days
    // (rest discarded); year-family -> whole months (rest discarded)
    lake.sql("CREATE TABLE ivf(id INTEGER, iv INTERVAL); " +
      "INSERT INTO ivf VALUES (1, INTERVAL '1.5 days'), " +
      "(2, INTERVAL '1.25 months'), (3, INTERVAL '1.55 years'), " +
      "(4, INTERVAL '1 quarter'), (5, INTERVAL '-1.5 days'), " +
      "(6, INTERVAL '1.5 weeks'), (7, INTERVAL '2 decades')")
    assert(lake.sql("SELECT iv FROM ivf ORDER BY id").collect()
      .map(_.getString(0)).toSeq == Seq(
        "1 day 12:00:00", "1 month 7 days", "1 year 6 months",
        "3 months", "-1 day -12:00:00", "10 days 12:00:00", "20 years"))
    // generate_subscripts of an empty list: zero rows (Spark's
    // sequence(1, 0) steps backward — the slice guard kills it)
    assert(lake.sql("SELECT generate_subscripts(slice([1], 1, 0), 1) AS i")
      .count() == 0L)
  }

  test("window EXCLUDE GROUP/TIES: supported frames run, the rest stay loud") {
    val lake = freshLake()
    lake.sql("CREATE TABLE wg(id INTEGER, k INTEGER, v INTEGER); " +
      "INSERT INTO wg VALUES (1,1,10),(2,1,20),(3,2,30)")
    // whole-partition RANGE frame: GROUP excludes self + peers
    val r = lake.sql(
      """SELECT id, CAST(sum(v) OVER (ORDER BY k
        |  RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |  EXCLUDE GROUP) AS BIGINT) AS s FROM wg ORDER BY id""".stripMargin)
      .collect()
    assert(r.map(x => Option(x.get(1)).map(_.toString).orNull).toSeq ==
      Seq("30", "30", "30"))
    def bad(q: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] { lake.sql(q) }
      assert(e.getMessage.contains(needle), s"$q -> ${e.getMessage}")
    }
    // a non-decomposable function stays loud under GROUP/TIES too
    bad("SELECT max(v) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING " +
        "AND UNBOUNDED FOLLOWING EXCLUDE GROUP) FROM wg", "max")
    // a RANGE frame that never spans the peer group stays loud
    bad("SELECT sum(v) OVER (ORDER BY k RANGE BETWEEN 5 PRECEDING AND " +
        "2 PRECEDING EXCLUDE TIES) FROM wg", "EXCLUDE TIES")
  }

  test("INSERT…RETURNING with a volatile default returns the WRITTEN draw") {
    val lake = freshLake()
    lake.sql("CREATE TABLE vr(id INTEGER, uid VARCHAR DEFAULT uuid(), " +
      "r DOUBLE DEFAULT random())")
    val ret = lake.sql("INSERT INTO vr(id) VALUES (1), (2) RETURNING id, uid, r")
      .collect().sortBy(_.getInt(0))
    val stored = lake.sql("SELECT id, uid, r FROM vr ORDER BY id").collect()
    assert(ret.length == 2 && stored.length == 2)
    ret.zip(stored).foreach { case (a, b) =>
      assert(a.getInt(0) == b.getInt(0))
      // the returned values must BE the stored values, not a fresh draw
      assert(a.getString(1) == b.getString(1))
      assert(a.getDouble(2) == b.getDouble(2))
    }
    // each row drew its own uuid
    assert(stored(0).getString(1) != stored(1).getString(1))
    // the deterministic fast path still returns the literal post-image
    val det = lake.sql("INSERT INTO vr(id, uid, r) VALUES (3, 'x', 0.5) " +
      "RETURNING id, uid, r").head()
    assert(det.getInt(0) == 3 && det.getString(1) == "x" && det.getDouble(2) == 0.5)
  }
}
