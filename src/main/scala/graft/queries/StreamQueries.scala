package graft.queries

import graft.QueryDef.PresentOps
import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing semantics (SURVEY §2.10) in their batch form.
  * Each query calls the SAME aggregation function as the Structured
  * Streaming runtime (`graft.streaming.Streams`, whose readStream path
  * is exercised by `graft.streaming.StreamsSpec` with MemoryStream) —
  * these oracle-checked queries pin the shared window semantics.
  *
  * Window starts are emitted as epoch seconds (bigint): `events.ts` is
  * nanosecond parquet, and raw timestamp outputs would compare at
  * different precisions across engines.
  */
object StreamQueries {

  val defs: Seq[QueryDef] = Seq(

    // Tumbling 10-minute windows per event_type.
    QueryDef(
      "st_tumbling_window_agg",
      """SELECT (floor(epoch(ts::TIMESTAMP) / 600) * 600)::BIGINT AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin) { (s, d) =>
      graft.streaming.Streams.tumblingAgg(Tables.events(s, d))
        .presentSorted(col("win_start"), col("event_type"))
    },

    // Sliding windows: 10 minutes long, every 5 minutes — each event
    // lands in exactly two windows (starts at floor(t/300)*300 - {0,300}).
    QueryDef(
      "st_sliding_window_agg",
      """SELECT win_start, count(*) AS n, round(sum(value), 2) AS total FROM (
        |  SELECT (floor(epoch(ts::TIMESTAMP) / 300) * 300 - 300 * k.k)::BIGINT
        |           AS win_start, value
        |  FROM events, (SELECT unnest([0, 1]) AS k) k)
        |GROUP BY win_start ORDER BY win_start""".stripMargin) { (s, d) =>
      graft.streaming.Streams.slidingAgg(Tables.events(s, d))
        .presentSorted(col("win_start"))
    },

    // Session windows (30-minute gap) per user — gaps-and-islands oracle.
    // A gap of exactly 30m starts a NEW session (Spark session end is
    // exclusive), hence `>=` in the oracle.
    QueryDef(
      "st_session_window_agg",
      """WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
        |m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |            >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, floor(epoch(min(ts)))::BIGINT AS session_start,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      graft.streaming.Streams.sessionAgg(Tables.events(s, d))
        .presentSorted(col("user_id"), col("session_start"))
    },

    // ST4: streaming dropDuplicates state in batch form — first event per
    // (user_id, event_type) in event-time order.
    QueryDef(
      "st4_dedup_first_per_key",
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts::TIMESTAMP, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .presentSorted(col("user_id"), col("event_type"))
    },

    // Gap-based batch SESSIONIZATION (Funnel.sessionize, the batch twin
    // of st_session_window_agg that returns the SESSIONS, not just
    // their aggregates): 12-hour gap, one exchange on the user key
    // shared by the lag window, the boundary running sum and the final
    // per-session aggregate. Durations integer µs end-to-end.
    QueryDef(
      "win_sessionize_gap",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 43200000000
        |         THEN 1 ELSE 0 END AS nw
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT user_id, us,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                  ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  (max(us) - min(us))::BIGINT AS dur_us
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin) { (s, d) =>
      graft.operators.Funnel.sessionize(Tables.events(s, d),
          "user_id", "ts", "event_id", gapMinutes = 720)
        .presentSorted(col("user_id"), col("session_seq"))
    },

    // Stream-stream INNER JOIN with bounded state (Streams
    // .streamStreamJoin): purchases within 30 minutes AFTER each click,
    // per user — the two-sided time-range predicate that lets the
    // streaming runtime evict state past watermark + range. This is
    // the batch face of the SAME body StreamsSpec drives with
    // MemoryStreams; per-user pair counts keep the output stable.
    QueryDef(
      "st_stream_stream_join",
      """WITH l AS (SELECT user_id, ts::TIMESTAMP AS lts FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts::TIMESTAMP AS rts, value FROM events
        |      WHERE event_type = 'purchase')
        |SELECT l.user_id, count(*) AS n_pairs,
        |  round(sum(r.value), 2) AS total_value
        |FROM l JOIN r ON r.user_id = l.user_id
        |  AND r.rts >= l.lts AND r.rts <= l.lts + INTERVAL 30 MINUTE
        |GROUP BY l.user_id ORDER BY l.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("rts"), col("value"))
      graft.streaming.Streams
        .streamStreamJoin(clicks, purchases, "user_id", "30 minutes")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("value")), 2).as("total_value"))
        .presentSorted(col("user_id"))
    }
  )
}
