package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark
import graft.xlsx.{ExcelRemote, LocalXlsxRemote, XlsxCodec}

/** Per-sheet change detection on push (beyond the reference, whose own
  * README lists it as a TODO): only sheets whose content moved since the
  * pull base are written, and a push with NOTHING changed writes nothing.
  * Correctness stays byte-identical — a reopened lake must see the same
  * catalog either way (the existing E2E suites cover that); this spec
  * pins down WHICH sheets each push touches.
  */
class PushSkipSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** records the dirty set of every writeChanged call */
  private class Recording(path: String) extends ExcelRemote {
    private val inner = new LocalXlsxRemote(path)
    val writes = scala.collection.mutable.ArrayBuffer[Set[String]]()
    def exists: Boolean = inner.exists
    def sheetNames: Seq[String] = inner.sheetNames
    def readAll(): Seq[XlsxCodec.Sheet] = inner.readAll()
    def readSheet(name: String): Option[Seq[Seq[String]]] = inner.readSheet(name)
    def writeAll(sheets: Seq[XlsxCodec.Sheet]): Unit = {
      writes += sheets.map(_._1).toSet
      inner.writeAll(sheets)
    }
    override def writeChanged(sheets: Seq[XlsxCodec.Sheet], dirty: Set[String]): Unit = {
      writes += dirty
      inner.writeAll(sheets) // local file: full atomic rewrite either way
    }
  }

  test("pushes write only the sheets that changed; no-op DML pushes nothing new") {
    val dir = Files.createTempDirectory("graft_pushskip").toString
    val rec = new Recording(s"$dir/lake.xlsx")
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data",
      remoteOverride = Some(rec))
    lake.sql("CREATE TABLE ps(id INTEGER, v VARCHAR)")
    val bootstrap = rec.writes.last
    assert(bootstrap.nonEmpty, "bootstrap push must write")

    rec.writes.clear()
    lake.sql("INSERT INTO ps VALUES (1, 'a')")
    assert(rec.writes.nonEmpty)
    val insertDirty = rec.writes.last
    // an INSERT moves the snapshot/table/file/stats surfaces...
    assert(insertDirty.exists(_.contains("snapshot")), s"got $insertDirty")
    assert(insertDirty.exists(_.contains("data_file")), s"got $insertDirty")
    // ...but never the schema/table-definition sheets
    assert(!insertDirty.exists(_.endsWith("schema")), s"got $insertDirty")
    assert(!insertDirty.contains("column"), s"got $insertDirty")
    assert(!insertDirty.contains("table"), s"got $insertDirty")

    // a pure SELECT changes nothing -> its push bracket writes NOTHING
    rec.writes.clear()
    lake.sql("SELECT * FROM ps")
    assert(rec.writes.forall(_.isEmpty) || rec.writes.isEmpty,
      s"read-only statement pushed sheets: ${rec.writes}")

    // the skipped-sheet bytes must be intact: a fresh lake reads it all back
    val reopened = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    val rows = reopened.sql("SELECT * FROM ps ORDER BY id").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a")))
  }
}
