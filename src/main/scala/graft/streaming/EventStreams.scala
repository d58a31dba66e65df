package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

case class UserRunningTotal(user_id: Long, n_events: Long, total_value: Double)

/** A closed gap-session emitted by [[EventStreams.sessionizeWithState]].
  * `total` carries cents internally, emitted as the dollars double —
  * matching the batch side's DECIMAL(18,2) discipline exactly. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                         n: Long, total: Double)

/** Open-session state for [[EventStreams.sessionizeWithState]]: timestamps
  * as epoch micros, money as cents — all-integer so streaming totals are
  * bit-identical to the batch DECIMAL sums at any arrival order. */
case class SessionState(startUs: Long, lastUs: Long, n: Long, cents: Long)

/** Structured-Streaming operators over the events stream (SURVEY §2.B.10 —
  * an *extension* beyond the reference, which is request/response only).
  *
  * Every transform below is written against a plain DataFrame so the SAME
  * code serves batch (finite parquet) and streaming (`readStream`) inputs —
  * the streaming spec asserts streaming output == batch output on identical
  * data. Watermarks bound state: at 100 TB/day the windowed aggregation
  * state is O(active windows × groups), not O(stream length).
  */
object EventStreams {

  /** events schema for readStream, parameterized on how the fixture wrote
    * `ts` (nanos long under spark.sql.legacy.parquet.nanosAsLong=true, or a
    * native micros TIMESTAMP_NTZ); normalized to a session-TZ TIMESTAMP
    * exactly like [[graft.Tables.normalizeEventsTs]]. */
  def eventsSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    // readStream needs an explicit schema; probe the footer with one cheap
    // batch read so the stream matches whichever ts encoding is on disk.
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    graft.Tables.normalizeEventsTs(
      spark.readStream.schema(eventsSchema(tsType)).parquet(dir))
  }

  /** Tumbling-window counts/sums per event type with a watermark. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Sliding-window counts: each event lands in len/slide windows. */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Session windows per user (gap-based). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n"), col("total"))

  /** Streaming mutation ingestion (SURVEY §2.B.10 extension): a stream of
    * node rows upserted into the live catalog per micro-batch. Searches
    * between batches see a consistent snapshot (the catalog swap is
    * atomic); last-write-wins within and across batches. */
  def ingestNodes(nodeStream: org.apache.spark.sql.Dataset[graft.model.Node],
                  catalog: graft.store.TableCatalog)
      : org.apache.spark.sql.streaming.StreamingQuery =
    nodeStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.model.Node], _: Long) =>
        catalog.upsertNodes(batch.toDF())
      }
      .start()

  /** Exactly-once id-dedup with bounded state: duplicates of an event_id
    * arriving within the watermark horizon are dropped; state for ids older
    * than the watermark is evicted, so memory is O(events per horizon), not
    * O(stream length). Batch inputs fall back to plain dropDuplicates
    * (same result — batch has no late data). */
  /** First event per (user, type) — a streaming dedup on a composite
    * business key with keep-first semantics. Streaming: plain
    * dropDuplicates keeps the first ARRIVAL, which equals the batch
    * min-(ts, event_id) row whenever the source replays in event-time
    * order (StreamingSpec asserts the equality). State is O(|business
    * keys|) — bounded by key cardinality, not stream length, so no
    * watermark eviction is needed (dropDuplicatesWithinWatermark would
    * RE-EMIT a key once the watermark passes it — the within-horizon
    * id-dedup semantics [[dedupEvents]] covers, not keep-first-ever).
    * Batch: one key-partitioned window — no global sort. */
  def firstEventPerKey(events: DataFrame): DataFrame = {
    val picked =
      if (events.isStreaming)
        events.dropDuplicates("user_id", "event_type")
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        events.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
      }
    picked.select(col("user_id"), col("event_type"),
      col("event_id").as("first_event_id"), col("ts").as("first_ts"))
  }

  /** Ordered conversion funnel: per stage i, the users whose FIRST
    * stage-i event strictly follows their first-qualifying stage-(i−1)
    * time — the product-analytics sequence query (view → click →
    * purchase), where order matters: a purchase BEFORE the first
    * qualifying click does not convert. Each stage is one filtered
    * user-keyed min-ts aggregation joined to the previous stage's
    * per-user time — k linear passes at 100 TB, no per-user event-list
    * materialization and no window over the whole stream. Returns
    * (stage: 1-based int, stage_name, n_users, conv = n/stage-1-count
    * rounded 6). */
  def orderedFunnel(events: DataFrame, stages: Seq[String],
                    typeCol: String = "event_type", userCol: String = "user_id",
                    tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "orderedFunnel needs at least one stage")
    val perStage = stages.tail.foldLeft(List(
      events.filter(col(typeCol) === stages.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t")))) { (acc, st) =>
      val prev = acc.head
      val next = events.filter(col(typeCol) === st)
        .join(prev.select(col(userCol), col("t").as("tp")), userCol)
        .filter(col(tsCol) > col("tp"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
      next :: acc
    }.reverse
    val counts = perStage.zip(stages).zipWithIndex.map { case ((t, st), i) =>
      t.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(st).as("stage_name"),
          col("n_users"))
    }.reduce(_ unionByName _)
    val first = counts.filter(col("stage") === 1)
      .select(col("n_users").as("n1"))
    // empty first stage: NULL conversion on both engines (a bare divide
    // would give NaN here but a NULL/error in a SQL oracle)
    counts.crossJoin(broadcast(first))
      .select(col("stage"), col("stage_name"), col("n_users"),
        round(col("n_users").cast("double") / nullif(col("n1"), lit(0)), 6)
          .as("conv"))
      .orderBy(col("stage"))
  }

  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-stream join: each purchase matched to the same user's views in
    * the preceding hour. Both sides carry watermarks and the join condition
    * bounds event-time distance, so the join state is evictable — the
    * canonical funnel/attribution join at stream scale. Works identically
    * on batch inputs (plain interval join). */
  def viewToPurchase(events: DataFrame, within: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(views,
      col("v_user") === col("p_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $within"))
  }

  /** Stream-stream LEFT OUTER interval join: like [[viewToPurchase]] but
    * purchases with no preceding view still emit (null view columns) once
    * the watermark closes their join window — the attribution join that
    * also surfaces un-attributed conversions. In batch mode the outer rows
    * emit immediately (no watermark wait). */
  def viewToPurchaseOuter(events: DataFrame, within: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(views,
      col("v_user") === col("p_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $within"),
      "left_outer")
  }

  /** Custom state: per-user running totals via mapGroupsWithState — the
    * KeyValueGroupedDataset stateful path (the engine's answer to any
    * "custom state machine over a stream" requirement). */
  def runningUserTotals(events: DataFrame): Dataset[UserRunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select($"user_id", $"value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[UserRunningTotal]) =>
          val prev = state.getOption.getOrElse(UserRunningTotal(user, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { r => n += 1; tot += r._2 }
          val next = UserRunningTotal(user, n, tot)
          state.update(next)
          next
      }
  }

  /** Production gap-sessionization as an explicit state machine:
    * flatMapGroupsWithState with an EVENT-TIME TIMEOUT — the shape
    * session_window cannot express (emit each session the moment the
    * watermark passes its gap, carry custom per-session aggregates, bound
    * state to one fixed-width row per OPEN session). Money accumulates as
    * integer cents (the batch side's DECIMAL(18,2) discipline), timestamps
    * as epoch micros — totals are bit-identical to the batch gap-island
    * aggregation at any arrival order, which StreamingSpec asserts.
    *
    * Within a batch, a group's rows are sorted by event time before the
    * gap scan; across batches the watermark guarantees no event older than
    * the horizon arrives, so the sorted-scan + saved-state composition
    * equals the global sorted scan. On timeout (watermark > last + gap)
    * the open session closes and its one state row frees — state is
    * O(open sessions), independent of stream length. */
  def sessionizeWithState(events: DataFrame, gapMinutes: Int = 30,
                          watermark: String = "2 hours"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L

    def us(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    def close(user: Long, s: SessionState): ClosedSession = {
      val t = new java.sql.Timestamp(s.startUs / 1000000L * 1000L)
      t.setNanos(((s.startUs % 1000000L) * 1000L).toInt)
      ClosedSession(user, t, s.n, s.cents / 100.0)
    }

    events.withWatermark("ts", watermark)
      .select($"user_id", $"ts", $"value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map(close(user, _)).toSeq
            state.remove()
            closed.iterator
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var st = state.getOption
            rows.toSeq.sortBy(r => us(r._2)).foreach { r =>
              val t = us(r._2); val c = cents(r._3)
              st match {
                case None => st = Some(SessionState(t, t, 1L, c))
                case Some(s) if t - s.lastUs >= gapUs =>
                  out += close(user, s)
                  st = Some(SessionState(t, t, 1L, c))
                case Some(s) =>
                  st = Some(SessionState(s.startUs, math.max(s.lastUs, t),
                    s.n + 1L, s.cents + c))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes.toLong * 60L * 1000L)
            }
            out.iterator
          }
      }
  }
}
