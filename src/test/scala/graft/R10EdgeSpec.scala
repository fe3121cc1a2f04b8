package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark
import graft.lake.StatementRouter

/** Round-10 advice closures: COPY option whitelist + honored writer
  * options, the partitioned-COPY overwrite guard, currval-before-nextval,
  * ON CONFLICT DO NOTHING intra-source duplicate keys, and glob() URI
  * fidelity for scheme-qualified paths.
  */
class R10EdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshLake(): DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("graft_r10_edge").toString
    new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
  }

  test("parseCopyOptions: output-shaping options parsed, tuning tolerated, unknown thrown") {
    val (fmt, pby, w, ow) = StatementRouter.parseCopyOptions(
      "FORMAT csv, DELIMITER '|', HEADER false, QUOTE '\"', NULL 'NA', " +
      "COMPRESSION gzip, ROW_GROUP_SIZE 100000, OVERWRITE_OR_IGNORE")
    assert(fmt.contains("csv"))
    assert(pby.isEmpty)
    assert(w("sep") == "|" && w("header") == "false" && w("quote") == "\"" &&
      w("nullValue") == "NA" && w("compression") == "gzip")
    assert(ow)
    // PARTITION_BY list + quoted delimiter containing a comma
    val (_, p2, w2, ow2) = StatementRouter.parseCopyOptions(
      "PARTITION_BY (a, b), DELIMITER ','")
    assert(p2 == Seq("a", "b") && w2("sep") == "," && !ow2)
    // unknown output-shaping option: loud, not silent
    val e = intercept[IllegalArgumentException] {
      StatementRouter.parseCopyOptions("FORMAT csv, PER_THREAD_OUTPUT true")
    }
    assert(e.getMessage.contains("PER_THREAD_OUTPUT"))
  }

  test("COPY TO honors DELIMITER and HEADER false (was silently ignored)") {
    val lake = freshLake()
    lake.sql("CREATE TABLE cx(id INTEGER, v VARCHAR); " +
      "INSERT INTO cx VALUES (1,'a'),(2,'b')")
    val out = Files.createTempDirectory("graft_copy_opts").resolve("cx.csv")
    lake.sql(s"COPY cx TO '$out' (DELIMITER '|', HEADER false)")
    val lines = Files.readAllLines(out)
    assert(lines.size() == 2, lines)
    assert(lines.get(0) == "1|a" && lines.get(1) == "2|b", lines)
  }

  test("COPY TO / COPY FROM round-trip with shaping options") {
    val lake = freshLake()
    lake.sql("CREATE TABLE rt(id INTEGER, v VARCHAR); " +
      "INSERT INTO rt VALUES (1,'a'),(2,'with,comma')")
    val out = Files.createTempDirectory("graft_copy_rt").resolve("rt.csv")
    lake.sql(s"COPY rt TO '$out' (DELIMITER '|', HEADER false)")
    lake.sql("CREATE TABLE rt2(id INTEGER, v VARCHAR)")
    lake.sql(s"COPY rt2 FROM '$out' (DELIMITER '|', HEADER false)")
    val rows = lake.sql("SELECT id, v FROM rt2 ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "a"), (2, "with,comma")), rows.mkString(";"))
  }

  test("partitioned COPY TO refuses a non-empty target without OVERWRITE_OR_IGNORE") {
    val lake = freshLake()
    lake.sql("CREATE TABLE pt(id INTEGER, region VARCHAR); " +
      "INSERT INTO pt VALUES (1,'east'),(2,'west')")
    val tgt = Files.createTempDirectory("graft_copy_guard")
    Files.writeString(tgt.resolve("precious.txt"), "do not delete")
    val e = intercept[IllegalStateException] {
      lake.sql(s"COPY pt TO '$tgt' (FORMAT parquet, PARTITION_BY (region))")
    }
    assert(e.getMessage.contains("not empty"))
    assert(Files.exists(tgt.resolve("precious.txt")), "existing data must survive")
    // explicit opt-in replaces it
    lake.sql(s"COPY pt TO '$tgt' (FORMAT parquet, PARTITION_BY (region), OVERWRITE_OR_IGNORE)")
    val back = spark.read.parquet(tgt.toString)
    assert(back.count() == 2)
    assert(back.columns.contains("region"))
  }

  test("currval before the first nextval errors (DuckDB semantics)") {
    val lake = freshLake()
    lake.sql("CREATE SEQUENCE s10 START 5 INCREMENT 2")
    val e = intercept[IllegalArgumentException] {
      lake.sql("SELECT currval('s10') AS v")
    }
    assert(e.getMessage.contains("has not been drawn"))
    assert(lake.sql("SELECT nextval('s10') AS v").head().getLong(0) == 5L)
    assert(lake.sql("SELECT currval('s10') AS v").head().getLong(0) == 5L)
    // drawn-ness survives a reopen from the workbook alone
    val lake2 = new DuckLakeXLSpark(spark, lake.excelPath, lake.dataPath)
    assert(lake2.sql("SELECT currval('s10') AS v").head().getLong(0) == 5L)
  }

  test("INSERT ... ON CONFLICT DO NOTHING dedups duplicate keys inside the source") {
    val lake = freshLake()
    lake.sql("CREATE TABLE oc(id INTEGER PRIMARY KEY, v VARCHAR); " +
      "INSERT INTO oc VALUES (1,'kept')")
    // 1 conflicts with the target; 2 appears twice in the source — DuckDB's
    // row-at-a-time upsert keeps the FIRST (2,'first'), never both
    lake.sql("INSERT INTO oc VALUES (1,'clobber'),(2,'first'),(2,'second') " +
      "ON CONFLICT (id) DO NOTHING")
    val rows = lake.sql("SELECT id, v FROM oc ORDER BY id").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "kept"), (2, "first")), rows.mkString(","))
    // and the table stays upsertable afterwards (no duplicate-PK residue)
    lake.sql("INSERT INTO oc VALUES (2,'upd') ON CONFLICT (id) DO UPDATE SET v = EXCLUDED.v")
    assert(lake.sql("SELECT v FROM oc WHERE id = 2").head().getString(0) == "upd")
  }

  test("distributed nextval: multi-site interleave, empty scan, nested refusal") {
    val lake = freshLake()
    lake.sql("CREATE SEQUENCE ds START 1 INCREMENT 1; " +
      "CREATE TABLE dsrc(v VARCHAR); INSERT INTO dsrc VALUES ('x'),('y'); " +
      "CREATE TABLE ddst(a BIGINT, v VARCHAR, b BIGINT)")
    // two sites in one row: row-at-a-time interleave — (1,x,2), (3,y,4)
    lake.sql("INSERT INTO ddst SELECT nextval('ds'), v, nextval('ds') " +
      "FROM dsrc ORDER BY v")
    val rows = lake.sql("SELECT a, v, b FROM ddst ORDER BY a").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "x", 2L), (3L, "y", 4L)), rows.mkString(","))
    // empty scan: no rows, head unchanged (next draw continues at 5)
    lake.sql("INSERT INTO ddst SELECT nextval('ds'), v, 0 FROM dsrc WHERE v = 'none'")
    assert(lake.sql("SELECT nextval('ds') AS n").head().getLong(0) == 5L)
    // nested in an expression over a scan: refused loudly, never silent
    val e = intercept[IllegalArgumentException] {
      lake.sql("INSERT INTO ddst SELECT nextval('ds') + 1, v, 0 FROM dsrc")
    }
    assert(e.getMessage.contains("top-level select item"), e.getMessage)
  }

  test("recursive UNION: cycle-safe, chains into later CTEs, refuses non-convergence") {
    val lake = freshLake()
    lake.sql("CREATE TABLE e14(src INTEGER, dst INTEGER); " +
      "INSERT INTO e14 VALUES (1,2),(2,1),(2,3)")
    // UNION-distinct over a 2-cycle, then a FOLLOW-UP CTE consuming it
    val rows = lake.sql(
      """WITH RECURSIVE reach(node) AS (
        |  SELECT 1
        |  UNION
        |  SELECT e.dst FROM reach r JOIN e14 e ON e.src = r.node
        |), agg AS (SELECT count(*) AS n, CAST(sum(node) AS BIGINT) AS s FROM reach)
        |SELECT n, s FROM agg""".stripMargin).collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 3 && rows(0).getLong(1) == 6,
      rows.mkString(","))
    // a step that always produces fresh rows must fail LOUDLY at the cap
    // (lowered here: 1000 real iterations = 1000 Spark jobs of test time)
    spark.conf.set("spark.graft.recursionCap", "8")
    try {
      val e = intercept[IllegalArgumentException] {
        lake.sql("WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT n + 1 FROM t) " +
          "SELECT count(*) AS c FROM t")
      }
      assert(e.getMessage.contains("did not converge"), e.getMessage)
    } finally spark.conf.unset("spark.graft.recursionCap")
  }

  test("INSERT BY NAME refuses a column list; maps names regardless of order") {
    val lake = freshLake()
    lake.sql("CREATE TABLE bn2(a INTEGER, b VARCHAR)")
    lake.sql("INSERT INTO bn2 BY NAME SELECT 'v' AS b, 3 AS a")
    val r = lake.sql("SELECT a, b FROM bn2").head()
    assert(r.getInt(0) == 3 && r.getString(1) == "v")
    val e = intercept[IllegalArgumentException] {
      lake.sql("INSERT INTO bn2(a, b) BY NAME SELECT 'v' AS b, 3 AS a")
    }
    assert(e.getMessage.contains("no column list"), e.getMessage)
  }

  test("ROLLBACK discards the transaction's writes; COMMIT keeps them") {
    val lake = freshLake()
    lake.sql("CREATE TABLE tx(id INTEGER, v VARCHAR); INSERT INTO tx VALUES (1,'keep')")
    lake.sql(
      """BEGIN;
        |INSERT INTO tx VALUES (2,'discard');
        |UPDATE tx SET v = 'mutated' WHERE id = 1;
        |ROLLBACK;
        |BEGIN TRANSACTION;
        |INSERT INTO tx VALUES (3,'kept');
        |COMMIT""".stripMargin)
    val rows = lake.sql("SELECT id, v FROM tx ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "keep"), (3, "kept")), rows.mkString(","))
    // rolled-back state survives a reopen (the push carried the restored catalog)
    val re = new DuckLakeXLSpark(spark, lake.excelPath, lake.dataPath)
    assert(re.sql("SELECT count(*) AS c FROM tx").head().getLong(0) == 2)
    // protocol errors are loud, like DuckDB's
    val e1 = intercept[IllegalArgumentException] { lake.sql("ROLLBACK") }
    assert(e1.getMessage.contains("no transaction"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] { lake.sql("BEGIN; BEGIN") }
    assert(e2.getMessage.contains("already active"), e2.getMessage)
    // CREATE INDEX is accepted and dropped (the reference's in-memory
    // index never persisted through push/pull either)
    lake.sql("CREATE INDEX idx_tx ON tx(id); DROP INDEX idx_tx")
    // a view created inside a rolled-back txn must not stay resolvable
    lake.sql("BEGIN; CREATE VIEW txv AS SELECT id FROM tx; ROLLBACK")
    assertThrows[Exception] { lake.sql("SELECT * FROM txv") }
  }

  test("SET VARIABLE evaluates once; getvariable reads back; RESET yields NULL") {
    val lake = freshLake()
    lake.sql("CREATE TABLE vt(x INTEGER); INSERT INTO vt VALUES (10),(20)")
    // expression over a lake table, evaluated at SET time
    lake.sql("SET VARIABLE cutoff = (SELECT max(x) FROM vt)")
    lake.sql("SET VARIABLE tag = 'it''s'")
    val r = lake.sql("SELECT getvariable('cutoff') AS c, getvariable('tag') AS t").head()
    assert(r.getInt(0) == 20 && r.getString(1) == "it's", r)
    // set-time snapshot: later table changes don't move the variable
    lake.sql("INSERT INTO vt VALUES (99)")
    assert(lake.sql("SELECT getvariable('cutoff') AS c").head().getInt(0) == 20)
    // usable in a WHERE over a scan
    assert(lake.sql("SELECT count(*) AS n FROM vt WHERE x <= getvariable('cutoff')")
      .head().getLong(0) == 2)
    lake.sql("RESET VARIABLE cutoff")
    assert(lake.sql("SELECT getvariable('cutoff') AS c").head().isNullAt(0))
  }

  test("PREPARE/EXECUTE: $N and ? binding, DML through prepared, deallocate") {
    val lake = freshLake()
    lake.sql("CREATE TABLE pt10(id INTEGER, v VARCHAR); " +
      "INSERT INTO pt10 VALUES (1,'a'),(2,'b'),(3,'c')")
    lake.sql("PREPARE get_by_id AS SELECT id, v FROM pt10 WHERE id = $1")
    assert(lake.sql("EXECUTE get_by_id(2)").head().getString(1) == "b")
    // ? placeholders bind positionally; a literal '?' in a string survives
    lake.sql("PREPARE upd AS UPDATE pt10 SET v = ? WHERE id = ? AND v <> 'q?x'")
    lake.sql("EXECUTE upd('B', 2)")
    assert(lake.sql("SELECT v FROM pt10 WHERE id = 2").head().getString(0) == "B")
    // $N may repeat and appear out of order
    lake.sql("PREPARE win AS SELECT count(*) AS n FROM pt10 WHERE id >= $2 AND id <= $2 + $1")
    assert(lake.sql("EXECUTE win(1, 2)").head().getLong(0) == 2)
    lake.sql("DEALLOCATE get_by_id")
    val e = intercept[IllegalArgumentException] { lake.sql("EXECUTE get_by_id(1)") }
    assert(e.getMessage.contains("no prepared statement"), e.getMessage)
    lake.sql("DEALLOCATE IF EXISTS get_by_id") // no-throw
    val e2 = intercept[IllegalArgumentException] { lake.sql("EXECUTE upd('x')") }
    assert(e2.getMessage.contains("not enough"), e2.getMessage)
  }

  test("review fixes: BY NAME + nextval maps by name; SET VARIABLE list refused") {
    val lake = freshLake()
    lake.sql("CREATE SEQUENCE bs START 1; " +
      "CREATE TABLE bt(a BIGINT, b VARCHAR); " +
      "CREATE TABLE bsrc(v VARCHAR); INSERT INTO bsrc VALUES ('x'),('y')")
    // BY NAME with the sequence item aliased: 'b' text maps to column b,
    // draws to column a — positionally they'd be swapped (review-found)
    lake.sql("INSERT INTO bt BY NAME SELECT v AS b, nextval('bs') AS a " +
      "FROM bsrc ORDER BY v")
    val rows = lake.sql("SELECT a, b FROM bt ORDER BY a").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "x"), (2L, "y")), rows.mkString(","))
    // missing alias on the draw item is refused, not mis-mapped
    val e = intercept[IllegalArgumentException] {
      lake.sql("INSERT INTO bt BY NAME SELECT v AS b, nextval('bs') FROM bsrc")
    }
    assert(e.getMessage.contains("AS alias"), e.getMessage)
    // non-atomic variable values are refused, never stringified
    val e2 = intercept[IllegalArgumentException] {
      lake.sql("SET VARIABLE xs = [1, 2, 3]")
    }
    assert(e2.getMessage.contains("atomic"), e2.getMessage)
  }

  test("glob() keeps local paths bare and returns joinable paths") {
    val lake = freshLake()
    val dir = Files.createTempDirectory("graft_glob10")
    Files.writeString(dir.resolve("a.csv"), "x\n1\n")
    Files.writeString(dir.resolve("b.csv"), "x\n2\n")
    val rows = lake.sql(s"SELECT file FROM glob('$dir/*.csv') ORDER BY file").collect()
    val files = rows.map(_.getString(0)).toSeq
    assert(files == Seq(s"$dir/a.csv", s"$dir/b.csv"), files)
    // every returned path must be directly readable again (round-trip)
    files.foreach { f => assert(Files.exists(Paths.get(f)), f) }
  }
}
