package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.DuckLakeXLSpark

/** One-shot generator for the foreign-writer workbook fixture (r14
  * VERDICT item 7). Builds a lake whose single table's rows are INLINED
  * in the catalog (metadata-only commits — the committed workbook is
  * self-contained, no parquet directory needed), at the path given as
  * args(0). `tools/make_excel_fixture.py` then re-encodes the workbook
  * the way EXCEL saves files (sharedStrings + rich runs + phonetic
  * runs, styles.xml, docProps, dimension/spans attributes, t="b"
  * booleans) and the result is committed as
  * fixtures/excel_authored_lake.xlsx, read back by XlsxForeignSpec.
  *
  * Run: sbt "Test/runMain graft.tools.MakeFixtureLake /tmp/fixlake"
  */
object MakeFixtureLake {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data",
      inlineRowLimit = 16)
    lake.sql("CREATE TABLE crew(id INTEGER, name VARCHAR, flag BOOLEAN, score DOUBLE)")
    lake.sql("INSERT INTO crew VALUES " +
      "(1, 'Ada', true, 1.5), (2, 'Bo''z', false, -2.25), " +
      "(3, '東京 büro', true, 0.0), (4, NULL, NULL, 42.0)")
    println("[fixture] lake written to " + dir)
    spark.stop()
  }
}
