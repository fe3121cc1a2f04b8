package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark
import graft.xlsx.ExcelRemote

/** Foreign positional delete files (r4 verdict task #4): a workbook whose
  * `ducklake_delete_file` rows carry REAL delete-parquet paths (written by
  * DuckDB-DuckLake) must open with the deletes honored — merge-on-read at
  * scan, materialized into the native CoW shape before DML.
  */
class ForeignDeletesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  /** build a lake with one 4-row data file, then splice a foreign delete
    * parquet (dropping row ordinals 1 and 3) into the workbook the way a
    * real DuckDB-DuckLake writer would have recorded it
    */
  private def foreignLake(delSchema: Seq[String]): (String, String) = {
    val dir = Files.createTempDirectory("foreign_del").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake.sql(
      """CREATE TABLE fd(id INTEGER, val VARCHAR);
        |INSERT INTO fd VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')""".stripMargin)
    val t = lake.currentState.tableByName("fd").get
    val df = lake.currentState.filesOf(t.tableId).head
    // the delete parquet: positions 1 and 3 of that data file
    val delDir = Files.createTempDirectory(Paths.get(dir), "delw")
    val rows = delSchema match {
      case Seq("file_path", "pos") => Seq((df.path, 1L), (df.path, 3L))
      case _                       => Seq(("", 1L), ("", 3L))
    }
    import spark.implicits._
    val delDF =
      if (delSchema.contains("file_path"))
        rows.toDF("file_path", "pos")
      else rows.map(_._2).toDF("pos")
    delDF.coalesce(1).write.mode("overwrite").parquet(delDir.toString)
    val part = Files.list(delDir).iterator().asScala
      .find(p => p.getFileName.toString.startsWith("part-") &&
                 p.getFileName.toString.endsWith(".parquet")).get
    val delPath = Paths.get(dir, "delete_0.parquet")
    Files.move(part, delPath, StandardCopyOption.REPLACE_EXISTING)
    // splice the ducklake_delete_file row into the workbook
    val remote = ExcelRemote.pick(s"$dir/lake.xlsx")
    val sheets = remote.readAll()
    val patched = sheets.map {
      case ("delete_file", rws) =>
        ("delete_file", rws :+ Seq("9001", t.tableId.toString,
          lake.currentState.currentSnapshot.toString, "",
          df.dataFileId.toString, delPath.toString, "2"))
      case other => other
    }
    remote.writeAll(patched)
    (s"$dir/lake.xlsx", s"$dir/data")
  }

  test("a foreign lake with (file_path, pos) delete files opens with deletes honored") {
    val (xlsx, data) = foreignLake(Seq("file_path", "pos"))
    val lake = new DuckLakeXLSpark(spark, xlsx, data)
    assert(lake.sql("SELECT id, val FROM fd ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "alpha"), (3, "gamma")))
    // count + filter through the merge-on-read branch
    assert(lake.sql("SELECT count(*) AS c FROM fd").collect()(0).getLong(0) == 2L)
    assert(lake.sql("SELECT val FROM fd WHERE id >= 3").collect()(0).getString(0) == "gamma")
  }

  test("pos-only delete files resolve their target via the catalog pairing") {
    val (xlsx, data) = foreignLake(Seq("pos"))
    val lake = new DuckLakeXLSpark(spark, xlsx, data)
    assert(lake.sql("SELECT id FROM fd ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 3))
  }

  test("delete rows for stale (no-longer-linked) targets are ignored, not fatal") {
    // a multi-target delete parquet can carry rows whose target file was
    // since compacted away — those rows must not fail every table read
    // (r6 advice); only the live-file rows apply
    val dir = Files.createTempDirectory("foreign_del_stale").toString
    val lake0 = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    lake0.sql(
      """CREATE TABLE fd(id INTEGER, val VARCHAR);
        |INSERT INTO fd VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')""".stripMargin)
    val t = lake0.currentState.tableByName("fd").get
    val df = lake0.currentState.filesOf(t.tableId).head
    import spark.implicits._
    val delDir = Files.createTempDirectory(Paths.get(dir), "delw")
    Seq((df.path, 1L), (s"$dir/data/compacted_away_00.parquet", 0L))
      .toDF("file_path", "pos").coalesce(1).write.mode("overwrite").parquet(delDir.toString)
    val part = Files.list(delDir).iterator().asScala
      .find(p => p.getFileName.toString.startsWith("part-") &&
                 p.getFileName.toString.endsWith(".parquet")).get
    val delPath = Paths.get(dir, "delete_0.parquet")
    Files.move(part, delPath, StandardCopyOption.REPLACE_EXISTING)
    val remote = ExcelRemote.pick(s"$dir/lake.xlsx")
    remote.writeAll(remote.readAll().map {
      case ("delete_file", rws) =>
        ("delete_file", rws :+ Seq("9001", t.tableId.toString,
          lake0.currentState.currentSnapshot.toString, "",
          df.dataFileId.toString, delPath.toString, "2"))
      case other => other
    })
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    assert(lake.sql("SELECT id FROM fd ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 3, 4)) // only pos 1 dropped
  }

  test("DML materializes foreign deletes, then applies native CoW") {
    val (xlsx, data) = foreignLake(Seq("file_path", "pos"))
    val lake = new DuckLakeXLSpark(spark, xlsx, data)
    lake.sql("DELETE FROM fd WHERE id = 3")
    assert(lake.sql("SELECT id, val FROM fd ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "alpha")))
    // the delete-file rows are ended, the audit trail names the rewrite
    val st = lake.currentState
    val t = st.tableByName("fd").get
    assert(st.positionalDeletes(t.tableId).isEmpty,
      "materialization must end the foreign delete-file rows")
    assert(st.snapshotChanges.exists(_.changesMade.startsWith("materialized_deletes:")))
    // and the state survives reopen
    val reopened = new DuckLakeXLSpark(spark, xlsx, data)
    assert(reopened.sql("SELECT count(*) AS c FROM fd").collect()(0).getLong(0) == 1L)
  }
}
