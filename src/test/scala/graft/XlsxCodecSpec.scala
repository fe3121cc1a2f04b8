package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.xlsx.XlsxCodec

class XlsxCodecSpec extends AnyFunSuite {

  private def tmpXlsx(): String =
    Files.createTempFile("codec", ".xlsx").toString

  test("column naming is proper base-26 past Z (reference bug ducklakexl.py:570 fixed)") {
    assert(XlsxCodec.colName(0) == "A")
    assert(XlsxCodec.colName(25) == "Z")
    assert(XlsxCodec.colName(26) == "AA")
    assert(XlsxCodec.colName(27) == "AB")
    assert(XlsxCodec.colName(51) == "AZ")
    assert(XlsxCodec.colName(52) == "BA")
    assert(XlsxCodec.colName(701) == "ZZ")
    assert(XlsxCodec.colName(702) == "AAA")
    (0 until 1000).foreach(i => assert(XlsxCodec.colIndex(XlsxCodec.colName(i) + "1") == i))
  }

  test("write/read round-trip of a plain sheet") {
    val p = tmpXlsx()
    val rows = Seq(
      Seq("id", "val", "note"),
      Seq("1", "", "mid-row blank"), // trailing blanks are not representable
      Seq("2", "beta", "x<y & \"q\" 'z'"))
    XlsxCodec.write(p, Seq(("t", rows)))
    val back = XlsxCodec.read(p)
    assert(back.map(_._1) == Seq("t"))
    assert(back.head._2 == rows)
  }

  test("empty cells densify from sparse refs; 30-col row survives") {
    val p = tmpXlsx()
    val wide = (0 until 30).map(i => s"c$i")
    XlsxCodec.write(p, Seq(("wide", Seq(wide, wide.map(_.toUpperCase)))))
    val back = XlsxCodec.read(p).head._2
    assert(back == Seq(wide, wide.map(_.toUpperCase)))
  }

  test("multiple sheets keep declaration order and names") {
    val p = tmpXlsx()
    val sheets = Seq("snapshot", "schema", "table", "column").map(n =>
      (n, Seq(Seq("k"), Seq(n))))
    XlsxCodec.write(p, sheets)
    assert(XlsxCodec.sheetNames(p) == sheets.map(_._1))
    assert(XlsxCodec.read(p) == sheets)
  }

  test("property: write . read == id for random string matrices") {
    // xml-legal strings without control chars (codec drops them by design)
    val cellGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '&', '<', '>', '"', '\'', 'é', 'ü', '中')))
      .map(_.mkString)
    val rowGen = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, cellGen))
    val gridGen = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, rowGen))
    val prop = Prop.forAll(gridGen) { grid0 =>
      // normalize to representable expectations: trailing empty cells in a
      // row and trailing empty rows are not representable (Excel drops
      // them too) — compare after stripping both
      val grid = grid0.map(_.reverse.dropWhile(_.isEmpty).reverse)
        .reverse.dropWhile(_.isEmpty).reverse
      val p = tmpXlsx()
      XlsxCodec.write(p, Seq(("s", grid)))
      val back = XlsxCodec.read(p).head._2
        .map(_.reverse.dropWhile(_.isEmpty).reverse.toList).toList
      back == grid
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("rejects >31-char sheet names (Excel cap, ducklakexl.py:241)") {
    val p = tmpXlsx()
    assertThrows[IllegalArgumentException] {
      XlsxCodec.write(p, Seq(("x" * 32, Seq(Seq("a")))))
    }
  }
}
