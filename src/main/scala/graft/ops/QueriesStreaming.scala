package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** SURVEY.md §2.I wired into the driver gate: each query replays the
  * events parquet through a REAL streaming query (file source -> stateful
  * op -> memory sink) and the oracle states the batch-equivalent SQL. A
  * full replay of a finite stream must agree with the batch answer —
  * that's the exactly-once contract. Multi-batch semantics (late-data
  * drop, cross-batch dedup, watermark eviction) are proved in
  * StreamingSpec with MemoryStream, where batch boundaries are scripted.
  */
object QueriesStreaming {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "q_stream_tumbling" -> { (s, d) =>
      StreamingOps.runToMemory(s,
        StreamingOps.tumbling(StreamingOps.eventsStream(s, d)), "complete")
        .withColumn("win_start", col("win_start").cast("timestamp_ntz"))
        .orderBy("win_start", "event_type")
    },
    "q_stream_sliding" -> { (s, d) =>
      StreamingOps.runToMemory(s,
        StreamingOps.sliding(StreamingOps.eventsStream(s, d)), "complete")
        .withColumn("win_start", col("win_start").cast("timestamp_ntz"))
        .orderBy("win_start")
    },
    "q_stream_session" -> { (s, d) =>
      // session windows only support append: a session emits once the
      // watermark (max ts - 10 min) passes its end — the oracle applies
      // the same finalization cutoff
      StreamingOps.runToMemory(s,
        StreamingOps.sessions(StreamingOps.eventsStream(s, d)), "append")
        .withColumn("sess_start", col("sess_start").cast("timestamp_ntz"))
        .withColumn("sess_end", col("sess_end").cast("timestamp_ntz"))
        .orderBy("user_id", "sess_start")
    },
    "q_stream_watermark_late" -> { (s, d) =>
      // full-replay shape check; the actual late-row DROP is only
      // observable across batches -> StreamingSpec golden (no oracle)
      StreamingOps.runToMemory(s,
        StreamingOps.watermarkLate(StreamingOps.eventsStream(s, d)), "update")
        .withColumn("win_start", col("win_start").cast("timestamp_ntz"))
        .orderBy("win_start")
    },
    "q_stream_dedup" -> { (s, d) =>
      StreamingOps.runToMemory(s,
        StreamingOps.dedup(StreamingOps.eventsStream(s, d)), "append")
        .select("event_id", "user_id")
        .orderBy("event_id")
    },
    "q_stream_agg_state" -> { (s, d) =>
      StreamingOps.runToMemory(s,
        StreamingOps.aggState(StreamingOps.eventsStream(s, d)), "update")
        .orderBy("user_id")
    },
    "q_stream_static_join" -> { (s, d) =>
      StreamingOps.runToMemory(s,
        StreamingOps.enrichJoin(StreamingOps.eventsStream(s, d),
          Tables.t(s, d, "customer")), "complete")
        .orderBy("c_mktsegment")
    },
    "q_stream_stream_join" -> { (s, d) =>
      StreamingOps.runToMemory(s,
        StreamingOps.intervalJoin(StreamingOps.eventsStream(s, d)), "append")
        .orderBy("user_id", "click_id", "purchase_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      ("SELECT date_trunc('hour', ts) AS win_start, event_type, COUNT(*) AS cnt, " +
       "CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value " +
       "FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"),
    "q_stream_sliding" ->
      // each event belongs to the 4 sliding windows whose starts are the
      // 15-minute buckets in (ts-1h, ts]
      ("SELECT win_start, COUNT(*) AS cnt FROM (" +
       "SELECT time_bucket(INTERVAL '15 minutes', ts) - " +
       "unnest([INTERVAL '0 minutes', INTERVAL '15 minutes', INTERVAL '30 minutes', INTERVAL '45 minutes']) AS win_start " +
       "FROM events) GROUP BY win_start ORDER BY win_start"),
    "q_stream_session" ->
      // gaps-and-islands: new session when >= 30 min since previous event
      // (session window [start, last+gap) — an event exactly at last+gap
      // starts a NEW session, hence >=)
      ("""WITH x AS (
         |  SELECT user_id, ts, event_id,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
         |              THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), y AS (
         |  SELECT user_id, ts,
         |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM x)
         |SELECT min(ts) AS sess_start, max(ts) + INTERVAL '30 minutes' AS sess_end,
         |       user_id, COUNT(*) AS cnt
         |FROM y GROUP BY user_id, grp
         |HAVING max(ts) + INTERVAL '30 minutes' <= (SELECT max(ts) - INTERVAL '10 minutes' FROM events)
         |ORDER BY user_id, sess_start""".stripMargin),
    "q_stream_dedup" ->
      // event_id is unique in the data -> full replay passes everything
      // through; the cross-batch duplicate drop is specced in StreamingSpec
      "SELECT event_id, user_id FROM events ORDER BY event_id",
    "q_stream_agg_state" ->
      // single-batch replay -> one final update per user == batch count
      ("SELECT user_id, COUNT(*) AS events_seen FROM events " +
       "GROUP BY user_id ORDER BY user_id"),
    "q_stream_static_join" ->
      ("SELECT c_mktsegment, COUNT(*) AS cnt FROM events e " +
       "JOIN customer c ON e.user_id = c.c_custkey " +
       "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "q_stream_stream_join" ->
      ("SELECT e1.user_id AS user_id, e1.event_id AS click_id, e2.event_id AS purchase_id " +
       "FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id " +
       "AND e1.event_type = 'click' AND e2.event_type = 'purchase' " +
       "AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 30 MINUTE " +
       "ORDER BY e1.user_id, click_id, purchase_id")
  )
}
