package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** ENUM lake column type (r14 VERDICT task 4): VARCHAR carrier with a
  * synthesized membership CHECK, DuckDB's canonical `ENUM('a', 'b')`
  * DESCRIBE render (comma-space, '' escapes — measured), surviving the
  * xlsx push/pull round-trip like JSON/INTERVAL, enforcement intact
  * after reopen. Documented divergence (README): DuckDB sorts enums by
  * DEFINITION order, the VARCHAR carrier lexically.
  */
class LakeEnumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("ENUM column: insert, check, canonical DESCRIBE, reopen round-trip") {
    val dir = Files.createTempDirectory("graft_enum").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql("CREATE TABLE mood(m ENUM('happy', 'ok', 'it''s fine'), id INTEGER)")
    lake.sql("INSERT INTO mood VALUES ('happy', 1), ('it''s fine', 2), (NULL, 3)")
    assert(lake.sql("SELECT m FROM mood ORDER BY id").collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL")).toSeq ==
      Seq("happy", "it's fine", "NULL"))
    // canonical catalog render (DuckDB DESCRIBE spelling)
    val desc = lake.sql("DESCRIBE mood").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("m") == "ENUM('happy', 'ok', 'it''s fine')", desc)
    // non-member refused LOUDLY by the synthesized CHECK
    val e = intercept[Throwable] {
      lake.sql("INSERT INTO mood VALUES ('nope', 4)")
    }
    assert(e.getMessage != null)
    // reopen from the workbook: render AND enforcement survive
    val lake2 = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    val desc2 = lake2.sql("DESCRIBE mood").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc2("m") == "ENUM('happy', 'ok', 'it''s fine')", desc2)
    intercept[Throwable] {
      lake2.sql("INSERT INTO mood VALUES ('still nope', 5)")
    }
    assert(lake2.sql("SELECT count(*) AS n FROM mood").head().getLong(0) == 3L)
    // ADD COLUMN with an ENUM type gets the same treatment
    lake2.sql("ALTER TABLE mood ADD COLUMN lvl ENUM('lo','hi')")
    val desc3 = lake2.sql("DESCRIBE mood").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc3("lvl") == "ENUM('lo', 'hi')", desc3)
    intercept[Throwable] {
      lake2.sql("INSERT INTO mood VALUES ('ok', 6, 'mid')")
    }
    lake2.sql("INSERT INTO mood VALUES ('ok', 6, 'hi')")
    assert(lake2.sql("SELECT lvl FROM mood WHERE id = 6").head().getString(0) == "hi")
  }

  test("BIT column: bitstring check + canonical render; UNION is a NAMED refusal") {
    val dir = Files.createTempDirectory("graft_bit").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql("CREATE TABLE bt(b BIT, id INTEGER)")
    lake.sql("INSERT INTO bt VALUES ('0101', 1), ('', 2), (NULL, 3)")
    assert(lake.sql("SELECT b FROM bt WHERE id = 1").head().getString(0) == "0101")
    val desc = lake.sql("DESCRIBE bt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("b") == "BIT", desc)
    intercept[Throwable] { lake.sql("INSERT INTO bt VALUES ('0102', 4)") }
    assert(lake.sql("SELECT count(*) AS n FROM bt").head().getLong(0) == 3L)
    // UNION(...) sum type: a NAMED loud refusal, not the generic error
    val e = intercept[Throwable] {
      lake.sql("CREATE TABLE ut(u UNION(i INTEGER, s VARCHAR))")
    }
    assert(e.getMessage.contains("UNION(...)"), e.getMessage)
  }
}
