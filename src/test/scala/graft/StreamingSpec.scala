package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** multi-batch streaming semantics that full-replay oracles cannot see:
  * watermark-based late-data DROP, cross-batch stateful dedup, session
  * merging, and running state — each driven batch-by-batch via
  * MemoryStream (SURVEY.md §5.2 item 5)
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  case class E(event_id: Long, ts: Timestamp, user_id: Long,
               event_type: String, value: Double, props: String)

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
  private def ev(id: Long, min: Int, user: Long = 1L): E =
    E(id, ts(min), user, "click", 1.0, "{}")

  private def run(df: DataFrame, mode: String, name: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()

  test("watermark drops events >10 min late (E2E golden)") {
    val in = MemoryStream[E]
    val q = run(StreamingOps.watermarkLate(in.toDF()), "update", "wm_late")
    // batch 1: events at 00:00 and 01:00 -> watermark advances to 00:50
    in.addData(ev(1, 0), ev(2, 60))
    q.processAllAvailable()
    // batch 2: an event at 00:05 is 45 min behind the watermark -> DROPPED;
    // an event at 00:55 is within the 15-min window [00:45,01:00) >= wm -> kept
    in.addData(ev(3, 5), ev(4, 55))
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("wm_late")
      .groupBy("win_start").agg(max("cnt").as("cnt"))
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(counts("2024-01-01 00:00:00.0") == 1L, "late event must not increment 00:00 window")
    assert(counts("2024-01-01 00:45:00.0") == 1L)
    assert(counts("2024-01-01 01:00:00.0") == 1L)
  }

  test("dropDuplicatesWithinWatermark drops cross-batch duplicate ids") {
    val in = MemoryStream[E]
    val q = run(StreamingOps.dedup(in.toDF()), "append", "dedup_x")
    in.addData(ev(1, 0), ev(2, 1))
    q.processAllAvailable()
    in.addData(ev(2, 2), ev(3, 3)) // id 2 again, within watermark horizon
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_x").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("session windows merge events within the 30-min gap and split beyond it") {
    val in = MemoryStream[E]
    val q = run(StreamingOps.sessions(in.toDF()), "append", "sess_x")
    // user 1: events 00:00, 00:20 (same session), 01:30 (new session)
    in.addData(ev(1, 0), ev(2, 20), ev(3, 90))
    q.processAllAvailable()
    // advance watermark far past everything so sessions finalize
    in.addData(ev(99, 600))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_x")
      .filter(col("user_id") === 1L)
      .select("sess_start", "sess_end", "cnt")
      .collect().map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getLong(2)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("2024-01-01 00:00:00.0", "2024-01-01 00:50:00.0", 2L), // 00:20 + 30min gap
      ("2024-01-01 01:30:00.0", "2024-01-01 02:00:00.0", 1L)))
  }

  test("stream-stream interval join matches across batches and bounds state") {
    val in = MemoryStream[E]
    val q = run(StreamingOps.intervalJoin(in.toDF()), "append", "ssj_x")
    def evt(id: Long, min: Int, typ: String, user: Long = 1L): E =
      E(id, ts(min), user, typ, 1.0, "{}")
    // batch 1: a click at 00:00 — no purchase yet
    in.addData(evt(1, 0, "click"))
    q.processAllAvailable()
    // batch 2: purchase at 00:20 (same user, within 30 min) joins the
    // batch-1 click — the click had to be HELD IN JOIN STATE across
    // batches; purchase at 00:45 is outside the interval; user 2's
    // purchase has no click at all
    in.addData(evt(2, 20, "purchase"), evt(3, 45, "purchase"), evt(4, 21, "purchase", user = 2))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_x")
      .select("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 1L, 2L)), s"got $rows")
  }

  test("flatMapGroupsWithState keeps running per-user counts across batches") {
    val in = MemoryStream[E]
    val q = run(StreamingOps.aggState(in.toDF()), "update", "state_x")
    in.addData(ev(1, 0, user = 7), ev(2, 1, user = 7), ev(3, 1, user = 8))
    q.processAllAvailable()
    in.addData(ev(4, 2, user = 7))
    q.processAllAvailable()
    q.stop()
    val latest = spark.table("state_x")
      .groupBy("user_id").agg(max("events_seen").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == Map(7L -> 3L, 8L -> 1L))
  }

  /** file-replay smoke test over the REAL driver fixtures. MemoryStream
    * coverage is structurally blind to the replay harness's file-schema
    * assumptions (r8: fixtures moved TIMESTAMP(NANOS)->MICROS and the
    * hardcoded nanos schema collapsed 30 days into 43 minutes while all
    * unit tests stayed green) — this test pins replay == batch on disk.
    */
  test("file replay of real fixtures matches the batch answer (ts-unit adaptive)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.tumbling(StreamingOps.eventsStream(spark, dir)), "complete")
    val batch = graft.ops.Tables.t(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(streamed.count() == batch.count(),
      s"replayed window count ${streamed.count()} != batch ${batch.count()}")
    // every event lands in exactly one tumbling window -> totals preserved
    val sTotal = streamed.agg(sum("cnt")).head.getLong(0)
    val bTotal = graft.ops.Tables.t(spark, dir, "events").count()
    assert(sTotal == bTotal, s"replayed event total $sTotal != batch $bTotal")
    // the 30-day fixture must span hundreds of hourly windows — a ts-unit
    // collapse (the r8 defect) would leave single-digit distinct windows
    assert(streamed.select("win_start").distinct.count() > 100)
  }

  /** replay == batch must survive the fixtures being SPLIT across files
    * (r8 verdict item 6). The split is adversarial: the LATER-time half
    * is written under the path that sorts FIRST, so any file-at-a-time
    * admission ordered by path would advance the watermark past the
    * earlier half and silently drop it. The harness admits all files in
    * one micro-batch (maxFilesPerTrigger unset), which this test pins.
    */
  test("file replay is batch-equivalent across multiple files in adversarial path order") {
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$src/events.parquet").exists())
    val tmp = java.nio.file.Files.createTempDirectory("graft_replay2").toString
    val ev = spark.read.parquet(s"$src/events.parquet")
    val mid = ev.select("ts").orderBy("ts")
      .collect()(ev.count().toInt / 2).get(0)
    ev.filter(col("ts") >= lit(mid)).coalesce(1)
      .write.parquet(s"$tmp/events_a_late.parquet")
    ev.filter(col("ts") < lit(mid)).coalesce(1)
      .write.parquet(s"$tmp/events_b_early.parquet")
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.tumbling(StreamingOps.eventsStream(spark, tmp)), "complete")
      .withColumn("win_start", col("win_start").cast("timestamp_ntz"))
    val batch = spark.read.parquet(s"$tmp/even*.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val cols = Seq("win_start", "event_type", "cnt").map(col)
    assert(streamed.select(cols: _*).exceptAll(batch.select(cols: _*)).isEmpty &&
           batch.select(cols: _*).exceptAll(streamed.select(cols: _*)).isEmpty,
      "two-file replay diverged from the batch answer")
  }

  /** Both branches of the eventsStream ts-unit probe must stay exercised
    * even after the legacy driver fixtures disappear (r9 verdict item 5):
    * generate a TIMESTAMP(NANOS)-generation twin IN-TEST (epoch-nanos
    * Long `ts` — exactly what nanosAsLong surfaces for a NANOS file) and
    * pin that its replay equals the current micros fixture's replay.
    */
  test("legacy NANOS-generation fixture replays identically to the micros fixture") {
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$src/events.parquet").exists())
    val ev = spark.read.parquet(s"$src/events.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    ev.withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
      .coalesce(1).write.parquet(s"$tmp/events.parquet")
    // the probe must see LongType ts and take the nanos branch
    val nanosStream = StreamingOps.eventsStream(spark, tmp)
    assert(nanosStream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val sN = StreamingOps.runToMemory(spark,
      StreamingOps.tumbling(nanosStream), "complete")
    val sM = StreamingOps.runToMemory(spark,
      StreamingOps.tumbling(StreamingOps.eventsStream(spark, src)), "complete")
    val cols = Seq("win_start", "event_type", "cnt").map(col)
    assert(sN.select(cols: _*).exceptAll(sM.select(cols: _*)).isEmpty &&
           sM.select(cols: _*).exceptAll(sN.select(cols: _*)).isEmpty,
      "nanos-generation replay diverged from the micros-generation replay")
    assert(sN.count() > 0)
  }
}
