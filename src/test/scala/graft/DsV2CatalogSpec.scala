package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** The DSv2 `DuckLakeCatalog` acceptance bar (r4 verdict task #1): catalog
  * resolution must be NATIVE — qualified names, `USE`, time travel, and
  * INSERT through plain `spark.sql`, with the old regex strips deleted.
  */
class DsV2CatalogSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def freshLake(name: String = "my_ducklake"): DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("dsv2_spec").toString
    new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data", lakeName = name)
  }

  test("an alias legitimately named `main` is not mangled") {
    val lake = freshLake()
    lake.sql(
      """CREATE TABLE ordx(id INTEGER, v VARCHAR);
        |INSERT INTO ordx VALUES (1,'a'),(2,'b')""".stripMargin)
    val rows = lake.sql("SELECT main.id FROM ordx main ORDER BY main.id")
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 2))
    // and a string literal containing travel syntax survives
    val lit = lake.sql("SELECT 'x AT (VERSION => 1)' AS s FROM ordx WHERE id = 1")
      .collect()(0).getString(0)
    assert(lit == "x AT (VERSION => 1)")
  }

  test("plain spark.sql resolves qualified names + VERSION/TIMESTAMP AS OF") {
    val lake = freshLake()
    lake.sql(
      """CREATE TABLE nt(id INTEGER, v VARCHAR);
        |INSERT INTO nt VALUES (1,'a'),(2,'b'),(3,'c')""".stripMargin)
    val before = lake.currentState.currentSnapshot
    lake.sql("DELETE FROM nt WHERE id = 1")
    // NO lake.sql here: straight through the session, catalog does the work
    assert(spark.sql("SELECT count(*) AS c FROM my_ducklake.main.nt")
      .collect()(0).getLong(0) == 2L)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM my_ducklake.main.nt VERSION AS OF $before")
      .collect()(0).getLong(0) == 3L)
    assert(spark.sql(
      "SELECT count(*) AS c FROM my_ducklake.main.nt TIMESTAMP AS OF '2100-01-01 00:00:00'")
      .collect()(0).getLong(0) == 2L)
    // filters + projection through the bridge stay correct
    assert(spark.sql(
      "SELECT v FROM my_ducklake.main.nt WHERE id >= 3").collect()(0).getString(0) == "c")
  }

  test("INSERT INTO through plain spark.sql lands in the lake (V1 write bridge)") {
    val lake = freshLake()
    lake.sql("CREATE TABLE wt(id INTEGER, v VARCHAR)")
    spark.sql("INSERT INTO my_ducklake.main.wt VALUES (1, 'a'), (2, 'b')")
    // visible through the lake AND persisted in the workbook
    assert(lake.sql("SELECT count(*) AS c FROM wt").collect()(0).getLong(0) == 2L)
    val reopened = new DuckLakeXLSpark(spark, lake.excelPath, lake.dataPath)
    assert(reopened.sql("SELECT id FROM wt ORDER BY id")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    // INSERT OVERWRITE truncates first
    spark.sql("INSERT OVERWRITE my_ducklake.main.wt VALUES (9, 'z')")
    assert(lake.sql("SELECT id FROM wt").collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("USE + SHOW TABLES through the session catalog") {
    val lake = freshLake()
    lake.sql("CREATE TABLE st(id INTEGER, v VARCHAR)")
    val prev = spark.catalog.currentCatalog()
    try {
      spark.sql("USE my_ducklake")
      assert(spark.sql("SELECT count(*) AS c FROM main.st").collect()(0).getLong(0) == 0L)
      val listed = spark.sql("SHOW TABLES IN my_ducklake.main").collect()
        .map(_.getString(1)).toSeq
      assert(listed.contains("st"))
    } finally spark.catalog.setCurrentCatalog(prev)
  }

  test("multi-schema: same-named tables in two schemas stay distinct") {
    val lake = freshLake()
    lake.sql(
      """CREATE SCHEMA staging;
        |CREATE TABLE t(id INTEGER, v VARCHAR);
        |INSERT INTO t VALUES (1,'main');
        |CREATE TABLE staging.t(id INTEGER, v VARCHAR);
        |INSERT INTO staging.t VALUES (100,'stg'),(200,'stg')""".stripMargin)
    assert(lake.sql("SELECT count(*) AS c FROM t").collect()(0).getLong(0) == 1L)
    assert(lake.sql("SELECT count(*) AS c FROM staging.t").collect()(0).getLong(0) == 2L)
    // USE switches the default schema for bare names
    assert(lake.sql("USE staging; SELECT count(*) AS c FROM t")
      .collect()(0).getLong(0) == 2L)
    assert(lake.sql("USE main; SELECT count(*) AS c FROM t")
      .collect()(0).getLong(0) == 1L)
    // both visible fully qualified through plain spark.sql
    assert(spark.sql("SELECT v FROM my_ducklake.staging.t WHERE id = 100")
      .collect()(0).getString(0) == "stg")
    // r5 advice: the two tables must NOT share a data directory — a
    // directory-granular reader (tableStream) over main.t would otherwise
    // silently ingest staging.t's files
    val mainDir = java.nio.file.Paths.get(lake.dataPath, "t")
    val stgDir = java.nio.file.Paths.get(lake.dataPath, "staging", "t")
    def parquets(p: java.nio.file.Path): Long =
      if (!java.nio.file.Files.isDirectory(p)) 0L
      else java.nio.file.Files.list(p).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet")).toLong
    assert(parquets(mainDir) == 1L, s"main.t files alone under $mainDir")
    assert(parquets(stgDir) == 1L, s"staging.t files under $stgDir")
    // persists across reopen (ducklake_schema rows in the workbook)
    val reopened = new DuckLakeXLSpark(spark, lake.excelPath, lake.dataPath)
    assert(reopened.sql("SELECT count(*) AS c FROM staging.t")
      .collect()(0).getLong(0) == 2L)
    assert(reopened.currentState.liveSchemas().map(_.schemaName).sorted ==
      Vector("main", "staging"))
    // DROP SCHEMA refuses while occupied, CASCADE drops members
    assertThrows[IllegalArgumentException](reopened.sql("DROP SCHEMA staging"))
    reopened.sql("DROP SCHEMA staging CASCADE")
    assert(reopened.currentState.liveSchemas().map(_.schemaName) == Vector("main"))
  }

  test("ALTER COLUMN TYPE widens across file epochs; travel sees the old type") {
    val lake = freshLake()
    lake.sql(
      """CREATE TABLE wc(id INTEGER, qty INTEGER);
        |INSERT INTO wc VALUES (1, 10),(2, 20)""".stripMargin)
    val before = lake.currentState.currentSnapshot
    lake.sql("ALTER TABLE wc ALTER COLUMN qty TYPE BIGINT")
    lake.sql("INSERT INTO wc VALUES (3, 30000000000)")
    // current schema is BIGINT; old INT file upcasts per epoch group
    val df = lake.sql("SELECT id, qty FROM wc ORDER BY id")
    assert(df.schema("qty").dataType == org.apache.spark.sql.types.LongType)
    assert(df.collect().map(_.getLong(1)).toSeq == Seq(10L, 20L, 30000000000L))
    // DML crosses the type epoch (readFiles casts the same way)
    lake.sql("UPDATE wc SET qty = qty + 1 WHERE id = 1")
    lake.sql("DELETE FROM wc WHERE qty = 20")
    assert(lake.sql("SELECT qty FROM wc ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(11L, 30000000000L))
    // time travel BEFORE the alter answers under the old type
    val old = lake.tableAt("wc", before)
    assert(old.schema("qty").dataType == org.apache.spark.sql.types.IntegerType)
    assert(old.count() == 2L)
    // narrowing refuses; non-numeric refuses
    assertThrows[IllegalArgumentException](
      lake.sql("ALTER TABLE wc ALTER COLUMN qty TYPE INTEGER"))
    // LOSSY promotions refuse too (r5 advice): BIGINT->DOUBLE drops
    // precision above 2^53 and INTEGER->FLOAT above 2^24 — DuckLake
    // widening is lossless-only
    assertThrows[IllegalArgumentException](
      lake.sql("ALTER TABLE wc ALTER COLUMN qty TYPE DOUBLE"))
    assertThrows[IllegalArgumentException](
      lake.sql("ALTER TABLE wc ALTER COLUMN id TYPE FLOAT"))
    // survives reopen from the workbook alone
    val reopened = new DuckLakeXLSpark(spark, lake.excelPath, lake.dataPath)
    assert(reopened.sql("SELECT sum(qty) AS s FROM wc").collect()(0).getLong(0) ==
      30000000011L)
  }

  test("CREATE/ALTER/DROP TABLE through plain spark.sql route into the lake") {
    val lake = freshLake()
    spark.sql("CREATE TABLE my_ducklake.main.ct (id INT, v STRING)")
    spark.sql("INSERT INTO my_ducklake.main.ct VALUES (1, 'a')")
    spark.sql("ALTER TABLE my_ducklake.main.ct ADD COLUMN qty INT")
    spark.sql("ALTER TABLE my_ducklake.main.ct ALTER COLUMN qty TYPE BIGINT")
    spark.sql("ALTER TABLE my_ducklake.main.ct RENAME COLUMN v TO label")
    assert(lake.sql("DESCRIBE ct").collect().map(r => (r.getString(0), r.getString(1)))
      .toSeq == Seq(("id", "INTEGER"), ("label", "VARCHAR"), ("qty", "BIGINT")))
    // the DDL went through the lake (persisted in the workbook)
    val reopened = new DuckLakeXLSpark(spark, lake.excelPath, lake.dataPath)
    assert(reopened.sql("SELECT id, label FROM ct").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a")))
    spark.sql("DROP TABLE my_ducklake.main.ct")
    // the drop landed in the workbook: any instance that pulls agrees
    // (lake.sql pulls; the first instance's in-memory state alone is stale
    // by design — workbook is the source of truth)
    assert(!lake.sql("SHOW TABLES").collect().map(_.getString(0)).contains("ct"))
    assert(lake.currentState.tableByName("ct").isEmpty)
  }

  test("aggregates over the bridge (empty required columns, count star)") {
    val lake = freshLake()
    lake.sql(
      """CREATE TABLE ag(id INTEGER, v VARCHAR);
        |INSERT INTO ag VALUES (1,'a'),(2,'b'),(3,'a')""".stripMargin)
    assert(spark.sql("SELECT count(*) AS c FROM my_ducklake.main.ag")
      .collect()(0).getLong(0) == 3L)
    val g = spark.sql(
      "SELECT v, count(*) AS c FROM my_ducklake.main.ag GROUP BY v ORDER BY v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(g == Seq(("a", 2L), ("b", 1L)))
  }
}
