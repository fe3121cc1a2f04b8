package graft
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.api.DuckLakeXLSpark
class TCDebug extends AnyFunSuite {
  test("probe") {
    val spark = SparkTestSession.spark
    val dir = Files.createTempDirectory("graft_probe").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    for (q <- Seq("concat('a', NULL, 'b')", "concat(NULL, NULL)",
        "concat(1, 'a', 2.5)", "substr('abcdef', 0, 3)", "substr('abcdef', 0)",
        "~5", "5 << 2", "5 >> 1", "1 << 63", "5 & 3", "5 | 3",
        "repeat('ab', -1)", "concat_ws(',', 'a', NULL, 'b')"))
      try println("GOT " + q + " => " + lake.sql(s"SELECT CAST(($q) AS VARCHAR) AS v").head().getString(0))
      catch { case e: Throwable => println("ERR " + q + " -- " + e.getMessage.linesIterator.take(1).mkString.take(70)) }
  }
}
