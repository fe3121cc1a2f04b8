package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** [[DuckLakeXLSpark.writeStreamTo]]: Structured Streaming micro-batches
  * append into a lake table through the same pull -> insert -> push (CAS)
  * bracket as sql(). The exactly-once contract across foreachBatch
  * REPLAYS is the `stream_batch:<table>` watermark in ducklake_metadata,
  * committed in the SAME workbook push as the batch's data.
  */
class StreamingLakeSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshLake(): DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("lake_sink").toString
    new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
  }

  test("micro-batches accumulate in the lake; a reopened lake sees them") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val lake = freshLake()
    lake.sql("CREATE TABLE sink_t(id INTEGER, v STRING)")
    val in = MemoryStream[(Int, String)]
    val ckpt = Files.createTempDirectory("ckpt").toString
    val q = lake.writeStreamTo(in.toDF().toDF("id", "v"), "sink_t", ckpt)
    try {
      in.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      assert(lake.sql("SELECT count(*) AS c FROM sink_t").head().getLong(0) == 2L)
      in.addData((3, "c"))
      q.processAllAvailable()
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      val rows = reopened.sql("SELECT id, v FROM sink_t ORDER BY id").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(rows == Seq((1, "a"), (2, "b"), (3, "c")))
    } finally q.stop()
  }

  test("a replayed batchId is skipped — no duplicate rows") {
    val s = spark
    import s.implicits._
    val lake = freshLake()
    lake.sql("CREATE TABLE replay_t(id INTEGER)")
    val batch = s.createDataset(Seq(10, 11)).toDF("id")
    lake.appendStreamBatch("replay_t", batch, batchId = 0L)
    // a foreachBatch retry after a post-commit crash re-delivers batch 0
    lake.appendStreamBatch("replay_t", batch, batchId = 0L)
    lake.appendStreamBatch("replay_t", s.createDataset(Seq(12)).toDF("id"), batchId = 1L)
    val ids = lake.sql("SELECT id FROM replay_t ORDER BY id").collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(10, 11, 12))
  }

  test("lake-to-lake loop: tableStream -> transform -> writeStreamTo") {
    val s = spark
    val lake = freshLake()
    lake.sql(
      """CREATE TABLE src_t(id INTEGER, v INTEGER);
        |CREATE TABLE dst_t(id INTEGER, doubled INTEGER);
        |INSERT INTO src_t VALUES (1, 10), (2, 20)""".stripMargin)
    val ckpt = Files.createTempDirectory("ckpt_loop").toString
    import org.apache.spark.sql.functions._
    val q = lake.writeStreamTo(
      lake.tableStream("src_t").select(col("id"), (col("v") * 2).as("doubled")),
      "dst_t", ckpt)
    try {
      q.processAllAvailable()
      // a second source append flows through the SAME running query
      lake.sql("INSERT INTO src_t VALUES (3, 30)")
      q.processAllAvailable()
      val rows = lake.sql("SELECT id, doubled FROM dst_t ORDER BY id").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(rows == Seq((1, 20), (2, 40), (3, 60)))
    } finally q.stop()
  }

  test("a concurrent writer between batches is absorbed by the CAS retry") {
    val s = spark
    import s.implicits._
    val lake = freshLake()
    lake.sql("CREATE TABLE cc_t(id INTEGER)")
    // writer B pushes AFTER A's in-memory state was pulled: A's next
    // append must CAS-reject, re-pull (seeing B's row), and replay
    val writerB = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
    writerB.sql("INSERT INTO cc_t VALUES (99)")
    lake.appendStreamBatch("cc_t", s.createDataset(Seq(1)).toDF("id"), batchId = 0L)
    val ids = lake.sql("SELECT id FROM cc_t ORDER BY id").collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(1, 99))
  }
}
