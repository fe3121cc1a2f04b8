package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** SURVEY.md §2.I — Structured Streaming face of the `events` table.
  * The reference is batch-only (DuckDB); these are the Spark-native
  * upgrade: the SAME windowed aggregations, run incrementally with state.
  *
  * Each op is a transformation over an unbounded DataFrame — callable both
  * from the file-replay harness below (driver correctness: full replay ==
  * batch oracle) and from MemoryStream tests (StreamingSpec: multi-batch
  * watermark/late-data/session semantics that only show up incrementally).
  *
  * Scale notes: all stateful ops key their state by (window x group) or
  * event id and carry watermarks so state is EVICTED — unbounded input,
  * bounded state. That is the property that survives an infinite stream,
  * not just a 10k-row replay.
  */
object StreamingOps {

  /** tumbling 1-hour window per event_type: count + sum(value) */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      // exact order-independent sum via 4-decimal scaled BIGINT (the
      // q_agg_groupby trick): Spark's decimal aggregation buffers cost
      // ~2x a long sum per row (measured at sf1, SCALE.md §7), and the
      // round-trip stays hash-identical to the DECIMAL(18,4) formulation
      .agg(count(lit(1)).as("cnt"),
        (sum(graft.ops.QueriesRelational.roundToLong(col("value") * 10000))
          .cast(DoubleType) / 10000.0).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** sliding 1-hour window, 15-minute slide: events per window */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("win_start"), col("cnt"))

  /** 30-minute-gap session windows per user */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("sess_start"), col("w.end").as("sess_end"),
        col("user_id"), col("cnt"))

  /** watermarked tumbling count — rows later than 10 min behind the
    * watermark are DROPPED (proved in StreamingSpec with two batches)
    */
  def watermarkLate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("win_start"), col("cnt"))

  /** stateful dedup on event_id within the watermark horizon */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** STREAM-STREAM interval join (funnel attribution: purchases within
    * 30 min of a click by the same user). Both sides carry watermarks and
    * the join condition bounds event time on BOTH ends, so Spark can
    * evict join state as the watermark advances — without the interval
    * bound the state would grow with the stream. Inner-join matches emit
    * as soon as both sides arrive (the watermark only governs state
    * eviction and late-row drop), so a full replay equals the batch
    * interval join — the oracle.
    */
  def intervalJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"), col("ts").as("pts"))
      .withWatermark("pts", "10 minutes")
    clicks.join(purchases,
        col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .select(col("cu").as("user_id"), col("click_id"), col("purchase_id"))
  }

  /** stream-static broadcast join: enrich the event stream with a static
    * dimension — the standard streaming-enrichment shape. The static side
    * re-resolves per micro-batch and broadcasts; the join itself needs no
    * streaming state, so it scales with the dimension, not the stream.
    */
  def enrichJoin(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(broadcast(customers),
      events("user_id") === customers("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))

  final case class Ev(ts: java.sql.Timestamp, event_id: Long, user_id: Long, value: Double)
  final case class UserCount(user_id: Long, events_seen: Long)

  /** custom state machine: running per-user event count via
    * flatMapGroupsWithState (KeyValueGroupedDataset — SURVEY §1.1 stream
    * row). Per-user state EVICTS 7 event-time days after the user's last
    * event (EventTimeTimeout — data-driven, fires only as the watermark
    * advances; a processing-time timeout would busy-poll empty batches),
    * honoring the module's unbounded-input/bounded-state invariant
    * (NoTimeout kept every user's counter forever — review-found). An
    * evicted user restarts at 0: the documented sliding-lifetime
    * semantics of an idle-TTL running count.
    */
  def aggState(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", "1 hour")
      .select(col("ts"), col("event_id"), col("user_id"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[Ev], state: org.apache.spark.sql.streaming.GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = evs.toVector
            val total = state.getOption.getOrElse(0L) + batch.size
            state.update(total)
            state.setTimeoutTimestamp(
              batch.map(_.ts.getTime).max + 7L * 24 * 3600 * 1000)
            Iterator(UserCount(user, total))
          }
        })
      .toDF()
  }

  // ---------------------------------------------------- file-replay harness
  private val memId = new AtomicLong(0)

  /** replay the events parquet as a stream. The fixture's `ts` physical
    * type has changed across driver generations — TIMESTAMP(NANOS) first
    * (which Spark surfaces as LongType under nanosAsLong), TIMESTAMP(MICROS)
    * now (surfaced as TimestampNTZ) — so, exactly like the batch side
    * (graft.ops.Tables.ensure), PROBE the file schema and adapt instead of
    * assuming a unit. Hardcoding the nanos shape once divided every micros
    * timestamp by 1000 and collapsed the 30-day corpus into 43 minutes.
    *
    * Multi-file contract: `maxFilesPerTrigger` is deliberately UNSET, so
    * the file source admits every available file into the FIRST
    * micro-batch — replay == batch holds for any number of fixture files
    * in any path/mtime order, because no watermark advances between
    * files. (Were replay ever made incremental, files would have to be
    * admitted in min(ts) order or late files would be dropped as the
    * watermark advances — StreamingSpec pins the two-file case.)
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    // tolerate legacy NANOS fixtures in the probe itself (no-op for micros)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val glob = s"$dir/even*.parquet"
    // glob (not a bare file path): the file stream source requires a
    // directory or glob basePath. Watermarks require TIMESTAMP (with local
    // tz), not NTZ — the session tz is pinned UTC, so the conversion is
    // value-preserving; query outputs cast window bounds back to NTZ.
    val fileSchema = scala.util.Try(spark.read.parquet(glob).schema).getOrElse(
      // no files match yet (stream started over an empty dir): declare
      // the CURRENT fixture generation (TIMESTAMP(MICROS) -> NTZ) so the
      // stream starts and picks files up as they land, like the old
      // hardcoded-schema code did
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampNTZType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    val tsIsLong =
      fileSchema.fields.exists(f => f.name == "ts" && f.dataType == LongType)
    if (tsIsLong) {
      // legacy TIMESTAMP(NANOS): read epoch-nanos Long, integer-narrow to
      // micros (`div 1000` stays in Long arithmetic — same rule as batch)
      spark.readStream.schema(fileSchema).parquet(glob)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      // TIMESTAMP(MICROS): declare the schema the file actually has and
      // only convert NTZ->TIMESTAMP for the watermark
      spark.readStream.schema(fileSchema).parquet(glob)
        .withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** run a streaming transform over the full replay into a memory sink and
    * return the materialized result (complete/update per `mode`)
    */
  def runToMemory(spark: SparkSession, streamed: DataFrame, mode: String): DataFrame = {
    val name = s"graft_mem_${memId.incrementAndGet()}"
    val q = streamed.writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try q.processAllAvailable()
    finally q.stop()
    // detach the result from the memory sink's temp view and DROP it —
    // each run otherwise pinned its full result in driver memory for the
    // session lifetime (review-found leak across bench/verify rounds)
    val out = spark.table(name).localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }
}
