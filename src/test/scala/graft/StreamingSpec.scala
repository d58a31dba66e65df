package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** File stream source needs a directory: stage the fixture in a temp dir. */
  lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming windowed counts == batch windowed counts on same data") {
    val stream = EventStreams.readEventsStream(spark, streamDir)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select($"window_start", $"event_type", $"n", $"total")
        .orderBy($"window_start", $"event_type")
        .collect().toSeq
      val batch = EventStreams.windowedCounts(Tables(spark, sf, "events"))
        .orderBy($"window_start", $"event_type")
        .collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch, s"streaming (${streamed.size}) vs batch (${batch.size})")
    } finally q.stop()
  }

  test("streaming session windows produce rows and respect the gap") {
    val stream = EventStreams.readEventsStream(spark, streamDir)
    val q = EventStreams.sessionCounts(stream)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("sess_out").collect()
      assert(sessions.nonEmpty)
      val batch = EventStreams.sessionCounts(Tables(spark, sf, "events")).count()
      assert(sessions.length == batch)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals == plain aggregation (batch mode)") {
    val events = Tables(spark, sf, "events")
    val got = EventStreams.runningUserTotals(events)
      .collect().map(r => r.user_id -> (r.n_events, r.total_value)).toMap
    val exp = events.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("t"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (u, (n, t)) =>
      assert(got(u)._1 == n)
      assert(math.abs(got(u)._2 - t) < 1e-6)
    }
  }
}
