package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.xlsx.XlsxCodec

/** Face B's own 100 TB question (r14 VERDICT task 7): the reference's
  * defining design point is a driver-side O(catalog) xlsx pull/push per
  * `sql()` (ducklakexl.py:394/512). SCALE.md §3 asserted O(catalog)
  * without measuring the 100k-`ducklake_data_file` design point — this
  * probe builds such a catalog THROUGH THE REAL CODEC (a small lake's
  * sheets with the data-file sheet + per-file column stats expanded to
  * N files), then measures: codec write wall, cold pull wall (ctor),
  * one full `sql()` INSERT (pull -> run -> push), and driver heap
  * before/after. Run: `sbt "runMain graft.LakeScaleProbe [N]"`.
  */
object LakeScaleProbe {
  private def usedMb(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val r = Runtime.getRuntime
    (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("lakescale").toString
    val seed = new graft.api.DuckLakeXLSpark(spark, s"$dir/seed.xlsx", s"$dir/data")
    seed.sql("CREATE TABLE f(id INTEGER, v VARCHAR, d DOUBLE, s VARCHAR)")
    seed.sql("INSERT INTO f VALUES (1,'a',1.5,'x'), (2,'b',2.5,'y')")

    val sheets = XlsxCodec.read(s"$dir/seed.xlsx")
    def expand(name: String, idCol: String, perFile: Int): XlsxCodec.Sheet = {
      val (shName, shRows) = sheets.find(_._1.contains(name)).getOrElse(
        sys.error(s"no sheet for $name in ${sheets.map(_._1)}"))
      val header = shRows.head
      val idIdx = header.indexWhere(_.trim == idCol)
      val pathIdx = header.indexWhere(_.trim == "path")
      val template = shRows.tail.take(perFile)
      require(idIdx >= 0 && template.nonEmpty, s"$name: $header")
      val big = Vector.newBuilder[Seq[String]]
      big += header
      var i = 0
      while (i < n) {
        template.foreach { row =>
          big += row.zipWithIndex.map { case (c, j) =>
            if (j == idIdx) (100000L + i).toString
            else if (j == pathIdx && pathIdx >= 0) s"f/data_scale_$i.parquet"
            else c
          }
        }
        i += 1
      }
      (shName, big.result())
    }
    val bigSheets: Seq[XlsxCodec.Sheet] = sheets.map { case sh @ (nm, _) =>
      if (nm.contains("data_file") && !nm.contains("delete")) {
        expand("data_file", "data_file_id", 1)
      } else if (nm.contains("file_column_statistics")) {
        expand("file_column_statistics", "data_file_id", 4)
      } else sh
    }
    val statRows = bigSheets.map(_._2.size.toLong).sum

    val t0 = System.nanoTime()
    XlsxCodec.write(s"$dir/big.xlsx", bigSheets)
    val writeSec = (System.nanoTime() - t0) / 1e9
    val xlsxMb = new java.io.File(s"$dir/big.xlsx").length() / (1024.0 * 1024.0)

    val memBefore = usedMb()
    val t1 = System.nanoTime()
    val big = new graft.api.DuckLakeXLSpark(spark, s"$dir/big.xlsx", s"$dir/data")
    val pullSec = (System.nanoTime() - t1) / 1e9
    val memAfter = usedMb()

    val t2 = System.nanoTime()
    big.sql("INSERT INTO f VALUES (3,'c',3.5,'z')")
    val sqlSec = (System.nanoTime() - t2) / 1e9

    // a second statement re-pulls a warm state and re-pushes
    val t3 = System.nanoTime()
    big.sql("INSERT INTO f VALUES (4,'d',4.5,'w')")
    val sqlSec2 = (System.nanoTime() - t3) / 1e9

    println(f"[lakescale] files=$n rows_total=$statRows xlsx_mb=$xlsxMb%.1f " +
      f"codec_write_s=$writeSec%.2f pull_s=$pullSec%.2f " +
      f"sql_insert1_s=$sqlSec%.2f sql_insert2_s=$sqlSec2%.2f " +
      f"heap_before_mb=$memBefore heap_after_pull_mb=$memAfter")
    spark.stop()
  }
}
