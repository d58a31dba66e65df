package graft.rel

import graft.{QueryDef, Tables}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Declared queries for the stream-shaped operators, run in batch mode —
  * the transforms are shared verbatim with the streaming path
  * (EventStreams), and StreamingSpec asserts streaming == batch on the same
  * data. Oracles: epoch-aligned tumbling windows ≡ date_trunc; session
  * windows ≡ gaps-and-islands (break when gap ≥ 30 min). */
object StreamQueries {

  val streamWindow = QueryDef(
    "q_stream_window",
    (s, dir) => {
      import s.implicits._
      EventStreams.windowedCounts(Tables(s, dir, "events"))
        .select(date_format($"window_start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"event_type", $"n", $"total")
        .orderBy($"window_start", $"event_type")
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM events
            GROUP BY date_trunc('hour', ts), event_type
            ORDER BY window_start, event_type"""))

  val streamSession = QueryDef(
    "q_stream_session",
    (s, dir) => {
      import s.implicits._
      EventStreams.sessionCounts(Tables(s, dir, "events"))
        .select(date_format($"session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          $"user_id", $"n", $"total")
        .orderBy($"user_id", $"session_start")
    },
    Some("""WITH x AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk,
                     event_id
              FROM events),
            y AS (SELECT user_id, ts, value,
                         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sess
                  FROM x)
            SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                   user_id, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM y GROUP BY user_id, sess
            ORDER BY user_id, session_start"""))

  /** Sliding windows (1h length, 30m slide): each event belongs to 2
    * windows; the oracle enumerates them by flooring to the slide grid. */
  val streamSliding = QueryDef(
    "q_stream_sliding",
    (s, dir) => {
      import s.implicits._
      EventStreams.slidingCounts(Tables(s, dir, "events"))
        .select(date_format($"window_start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"event_type", $"n", $"total")
        .orderBy($"window_start", $"event_type")
    },
    Some("""WITH w AS (
              SELECT event_type, value,
                     time_bucket(INTERVAL '30 minutes', ts) - u.k * INTERVAL '30 minutes' AS ws
              FROM events, unnest(range(2)) AS u(k))
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM w
            GROUP BY ws, event_type
            ORDER BY window_start, event_type"""))

  /** Stream-stream interval join (EventStreams.viewToPurchase): purchases
    * matched to same-user views in the preceding hour. Run here in batch
    * mode on the fixture; StreamingSpec asserts the streaming execution
    * produces the identical row set. The oracle truncates ns→µs first so
    * both engines compare the same instants. */
  val streamJoin = QueryDef(
    "q_stream_join",
    (s, dir) => {
      import s.implicits._
      EventStreams.viewToPurchase(Tables(s, dir, "events"))
        .select($"purchase_id", $"view_id", $"p_user".as("user_id"),
          (unix_micros($"p_ts") - unix_micros($"v_ts")).as("lag_us"))
        .orderBy($"purchase_id", $"view_id")
    },
    Some("""WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS v_ts, event_id AS view_id
                       FROM events WHERE event_type = 'view'),
                 p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts, event_id AS purchase_id
                       FROM events WHERE event_type = 'purchase')
            SELECT p.purchase_id, v.view_id, p.user_id,
                   epoch_us(p.p_ts) - epoch_us(v.v_ts) AS lag_us
            FROM p JOIN v ON v.user_id = p.user_id
                         AND v.v_ts <= p.p_ts
                         AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR
            ORDER BY purchase_id, view_id"""))

  /** LEFT OUTER variant (EventStreams.viewToPurchaseOuter): un-attributed
    * purchases survive with null view columns. NULLS FIRST pinned in the
    * oracle ORDER BY (Spark asc is nulls-first, DuckDB defaults last). */
  val streamJoinOuter = QueryDef(
    "q_stream_join_outer",
    (s, dir) => {
      import s.implicits._
      EventStreams.viewToPurchaseOuter(Tables(s, dir, "events"))
        .select($"purchase_id", $"view_id", $"p_user".as("user_id"))
        .orderBy($"purchase_id", $"view_id")
    },
    Some("""WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS v_ts, event_id AS view_id
                       FROM events WHERE event_type = 'view'),
                 p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts, event_id AS purchase_id
                       FROM events WHERE event_type = 'purchase')
            SELECT p.purchase_id, v.view_id, p.user_id
            FROM p LEFT JOIN v ON v.user_id = p.user_id
                              AND v.v_ts <= p.p_ts
                              AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR
            ORDER BY purchase_id, view_id NULLS FIRST"""))

  /** Keep-first dedup on the (user, type) business key
    * (EventStreams.firstEventPerKey) — batch mode here; StreamingSpec
    * asserts the streaming execution (plain dropDuplicates, O(|keys|)
    * state — dropDuplicatesWithinWatermark would re-emit expired keys)
    * yields the same retained set on event-time-ordered input. */
  val streamDedup = QueryDef(
    "q_stream_dedup",
    (s, dir) => {
      import s.implicits._
      EventStreams.firstEventPerKey(Tables(s, dir, "events"))
        .select($"user_id", $"event_type", $"first_event_id",
          date_format($"first_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"))
        .orderBy($"user_id", $"event_type")
    },
    Some("""SELECT user_id, event_type, event_id AS first_event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                               ORDER BY ts, event_id) AS rn
                  FROM events)
            WHERE rn = 1
            ORDER BY user_id, event_type"""))

  val all: Seq[QueryDef] =
    Seq(streamWindow, streamSession, streamSliding, streamJoin,
      streamJoinOuter, streamDedup)
}
