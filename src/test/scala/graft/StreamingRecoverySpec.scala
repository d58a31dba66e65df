package graft

import java.sql.Timestamp

import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Crash-recovery for the four streaming ingestion/maintenance pipelines:
  * stop each query mid-stream — INCLUDING with data already added to the
  * source but not yet processed — restart against the same
  * checkpointLocation and the same accumulated state, finish the stream,
  * and assert the final accepted set / snapshot / sketch EQUALS the
  * clean one-shot run bit-for-bit, with no re-emission and no loss. The
  * restart resumes from the checkpoint's committed offsets, and the
  * [[BatchOnce]] guard keeps any replayed batch from double-applying.
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ckptDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ckpt").toString

  lazy val docs = Tables(spark, sf, "documents")

  /** The planted arriving-corpus shape the ingest-dedup pipelines use:
    * corpus copies (must all drop), in-stream dup pairs (one survivor),
    * fresh edits (all survive). */
  lazy val arriving: Seq[(Long, String)] = docs.filter($"doc_id" < 20)
    .select(($"doc_id" + 300000).as("doc_id"), $"text")
    .unionByName(docs.filter($"doc_id" < 10)
      .select(($"doc_id" + 350000).as("doc_id"),
        concat($"text", lit(" brandnew")).as("text")))
    .unionByName(docs.filter($"doc_id" < 10)
      .select(($"doc_id" + 360000).as("doc_id"),
        concat($"text", lit(" brandnew")).as("text")))
    .unionByName(docs.filter($"doc_id" < 15)
      .select(($"doc_id" + 400000).as("doc_id"),
        concat($"text", lit(" fresh v2")).as("text")))
    .orderBy($"doc_id")
    .as[(Long, String)].collect().toSeq

  test("exact-digest ingest dedup survives kill + checkpoint restart") {
    implicit val sql = spark.sqlContext
    val shards = arriving.grouped(10).toSeq
    // clean one-shot run = the oracle
    val cleanIdx = IngestDedup.indexOf(docs, "text")
    val clean = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val s0 = MemoryStream[(Long, String)]
    val q0 = IngestDedup.start(s0.toDS().toDF("doc_id", "text"),
      "doc_id", "text", cleanIdx) { k => clean ++= k.as[(Long, String)].collect() }
    try {
      shards.foreach { sh => s0.addData(sh: _*); q0.processAllAvailable() }
    } finally q0.stop()
    assert(clean.nonEmpty)

    // crashed run: process the first half, enqueue one more shard
    // WITHOUT processing it (in-flight at crash time), stop, restart
    // from the same checkpoint + index, finish
    val ckpt = ckptDir()
    val idx = IngestDedup.indexOf(docs, "text")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val st = MemoryStream[(Long, String)]
    val src = st.toDS().toDF("doc_id", "text")
    val sink = (k: org.apache.spark.sql.DataFrame) =>
      { got ++= k.as[(Long, String)].collect(); () }
    val half = shards.length / 2
    val q1 = IngestDedup.start(src, "doc_id", "text", idx, Some(ckpt))(sink)
    try {
      shards.take(half).foreach { sh => st.addData(sh: _*); q1.processAllAvailable() }
      st.addData(shards(half): _*) // in-flight, never processed by q1
    } finally q1.stop()
    val q2 = IngestDedup.start(src, "doc_id", "text", idx, Some(ckpt))(sink)
    try {
      q2.processAllAvailable() // must pick the in-flight shard off the log
      shards.drop(half + 1).foreach { sh => st.addData(sh: _*); q2.processAllAvailable() }
    } finally q2.stop()
    assert(got.toSet == clean.toSet,
      s"recovered run diverged: ${got.toSet.diff(clean.toSet)} extra, " +
        s"${clean.toSet.diff(got.toSet)} missing")
    assert(got.size == got.toSet.size, "no accepted row may be re-emitted")
  }

  test("minhash near-dup ingest survives kill + checkpoint restart") {
    implicit val sql = spark.sqlContext
    // near-dup stream: corpus near-copies (drop), chained in-stream
    // mutations (greedy keep-first), fresh text (survive)
    val stream0 = docs.filter($"doc_id" < 12)
      .select(($"doc_id" + 500000).as("doc_id"),
        concat($"text", lit(" x9q")).as("text"))
      .unionByName(docs.filter($"doc_id" >= 30 && $"doc_id" < 42)
        .select(($"doc_id" + 600000).as("doc_id"),
          // fully synthetic ≥3-token text: shares NO shingle with the
          // corpus (an appended-prefix mutation would still be ~0.9
          // Jaccard to its original and correctly drop)
          concat(lit("zaq"), $"doc_id", lit(" xsw"), $"doc_id",
            lit(" cde"), $"doc_id", lit(" vfr"), $"doc_id").as("text")))
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    val shards = stream0.grouped(6).toSeq

    val cleanIdx = NearDupIngest.indexOf(docs, "doc_id", "text")
    val clean = scala.collection.mutable.ArrayBuffer.empty[Long]
    val s0 = MemoryStream[(Long, String)]
    val q0 = NearDupIngest.start(s0.toDS().toDF("doc_id", "text"),
      "doc_id", "text", cleanIdx) { k => clean ++= k.as[Long].collect() }
    try {
      shards.foreach { sh => s0.addData(sh: _*); q0.processAllAvailable() }
    } finally q0.stop()
    assert(clean.nonEmpty)

    val ckpt = ckptDir()
    val idx = NearDupIngest.indexOf(docs, "doc_id", "text")
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val st = MemoryStream[(Long, String)]
    val src = st.toDS().toDF("doc_id", "text")
    val sink = (k: org.apache.spark.sql.DataFrame) =>
      { got ++= k.as[Long].collect(); () }
    val q1 = NearDupIngest.start(src, "doc_id", "text", idx,
      checkpoint = Some(ckpt))(sink)
    try {
      shards.take(2).foreach { sh => st.addData(sh: _*); q1.processAllAvailable() }
      st.addData(shards(2): _*) // in-flight at crash
    } finally q1.stop()
    val q2 = NearDupIngest.start(src, "doc_id", "text", idx,
      checkpoint = Some(ckpt))(sink)
    try {
      q2.processAllAvailable()
      shards.drop(3).foreach { sh => st.addData(sh: _*); q2.processAllAvailable() }
    } finally q2.stop()
    assert(got.toSet == clean.toSet && got.size == got.toSet.size,
      s"recovered ${got.sorted} vs clean ${clean.sorted}")
  }

  test("CDC snapshot maintenance survives kill + checkpoint restart") {
    implicit val sql = spark.sqlContext
    val ev = Tables(spark, sf, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, Timestamp, Long, String, Double)].collect().toSeq
    val shards = (0 until 4).map(m => ev.filter(_._1 % 4 == m))
    val base = Tables(spark, sf, "customer")
      .select($"c_custkey".as("key"), $"c_acctbal".as("bal"))

    val cleanState = new CdcIngest.ChangeState(spark)
    val s0 = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q0 = CdcIngest.start(
      s0.toDS().toDF("event_id", "ts", "user_id", "event_type", "value"),
      cleanState)
    try {
      shards.foreach { sh => s0.addData(sh: _*); q0.processAllAvailable() }
    } finally q0.stop()
    val clean = CdcIngest.applySnapshot(base, cleanState.state)
      .orderBy($"key").collect().toSeq
    assert(clean.nonEmpty)

    val ckpt = ckptDir()
    val state = new CdcIngest.ChangeState(spark)
    val st = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val src = st.toDS().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q1 = CdcIngest.start(src, state, Some(ckpt))
    try {
      shards.take(2).foreach { sh => st.addData(sh: _*); q1.processAllAvailable() }
      st.addData(shards(2): _*) // in-flight at crash
    } finally q1.stop()
    val q2 = CdcIngest.start(src, state, Some(ckpt))
    try {
      q2.processAllAvailable()
      st.addData(shards(3): _*); q2.processAllAvailable()
    } finally q2.stop()
    val got = CdcIngest.applySnapshot(base, state.state)
      .orderBy($"key").collect().toSeq
    assert(got == clean, s"snapshot diverged after recovery")
  }

  test("CMS + histogram sketch maintenance survive kill + checkpoint restart") {
    implicit val sql = spark.sqlContext
    val vals = Tables(spark, sf, "events")
      .select($"user_id").as[Long].collect().toSeq
    val shards = vals.grouped(math.max(1, vals.length / 5)).toSeq

    // clean runs
    val cleanCms = CmsIngest.emptyIndex(spark)
    val cleanHist = HistogramIngest.emptyIndex(spark)
    val s0 = MemoryStream[Long]
    val df0 = s0.toDS().toDF("k")
    val qc0 = CmsIngest.start(df0, "k", depth = 3, width = 64, cleanCms)
    val qh0 = HistogramIngest.start(df0, "k", width = 10L, cleanHist)
    try {
      shards.foreach { sh =>
        s0.addData(sh: _*); qc0.processAllAvailable(); qh0.processAllAvailable()
      }
    } finally { qc0.stop(); qh0.stop() }
    val cleanSketch = cleanCms.sketch.orderBy($"d", $"bucket").collect().toSeq
    val cleanH = cleanHist.hist.orderBy($"b").collect().toSeq
    assert(cleanSketch.nonEmpty && cleanH.nonEmpty)

    // crashed + recovered runs (each query its own checkpoint lineage)
    val cms = CmsIngest.emptyIndex(spark)
    val hist = HistogramIngest.emptyIndex(spark)
    val (ck1, ck2) = (ckptDir(), ckptDir())
    val st = MemoryStream[Long]
    val src = st.toDS().toDF("k")
    val qc1 = CmsIngest.start(src, "k", 3, 64, cms, Some(ck1))
    val qh1 = HistogramIngest.start(src, "k", 10L, hist, Some(ck2))
    try {
      shards.take(2).foreach { sh =>
        st.addData(sh: _*); qc1.processAllAvailable(); qh1.processAllAvailable()
      }
      st.addData(shards(2): _*) // in-flight at crash for BOTH queries
    } finally { qc1.stop(); qh1.stop() }
    val qc2 = CmsIngest.start(src, "k", 3, 64, cms, Some(ck1))
    val qh2 = HistogramIngest.start(src, "k", 10L, hist, Some(ck2))
    try {
      qc2.processAllAvailable(); qh2.processAllAvailable()
      shards.drop(3).foreach { sh =>
        st.addData(sh: _*); qc2.processAllAvailable(); qh2.processAllAvailable()
      }
    } finally { qc2.stop(); qh2.stop() }
    // additive sketches are the double-count canary: totals must match
    // EXACTLY (a replayed batch would inflate them)
    assert(cms.sketch.orderBy($"d", $"bucket").collect().toSeq == cleanSketch,
      "CMS sketch diverged after recovery")
    assert(hist.hist.orderBy($"b").collect().toSeq == cleanH,
      "histogram diverged after recovery")
  }

  test("Misra-Gries maintenance: streamed == batch, superset holds, survives restart") {
    implicit val sql = spark.sqlContext
    val K = 16
    // the q_sketch_heavyhit key shape: 3 hot keys at ~8.3% each, cold tail
    val keyed = Tables(spark, sf, "events").select(
      when($"event_id" % 4 === 0,
        concat(lit("hot_"), ($"event_id" % 3).cast("string")))
        .otherwise(concat(lit("cold_"), $"event_id".cast("string"))).as("k"))
      .localCheckpoint()
    val want = SparkEntry.queries("q_sketch_heavyhit")(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(want.nonEmpty)

    val rows = keyed.as[String].collect().toSeq
    val shards = rows.grouped(math.max(rows.size / 5, 1)).toSeq

    // clean one-shot streamed run
    val clean = MgIngest.emptyIndex(K)
    val s0 = MemoryStream[String]
    val q0 = MgIngest.start(s0.toDS().toDF("k"), "k", clean)
    try {
      shards.foreach { sh => s0.addData(sh: _*); q0.processAllAvailable() }
    } finally q0.stop()
    assert(clean.candidates.size <= K - 1, "state bound violated")
    // superset guarantee: every true heavy key is among the candidates
    want.foreach { case (k, _) =>
      assert(clean.summary.contains(k), s"true heavy key $k lost")
    }
    // deterministic read == the declared batch two-pass result
    val streamedRead = MgIngest.exactHeavyHitters(keyed, "k", clean)
      .as[(String, Long)].collect().toSeq
    assert(streamedRead == want, s"streamed $streamedRead vs batch $want")

    // kill mid-stream WITH an in-flight shard, restart from checkpoint
    val ckpt = ckptDir()
    val idx = MgIngest.emptyIndex(K)
    val st = MemoryStream[String]
    val src = st.toDS().toDF("k")
    val q1 = MgIngest.start(src, "k", idx, Some(ckpt))
    try {
      shards.take(2).foreach { sh => st.addData(sh: _*); q1.processAllAvailable() }
      st.addData(shards(2): _*) // in-flight at crash
    } finally q1.stop()
    val q2 = MgIngest.start(src, "k", idx, Some(ckpt))
    try {
      q2.processAllAvailable() // picks the in-flight shard off the log
      shards.drop(3).foreach { sh => st.addData(sh: _*); q2.processAllAvailable() }
    } finally q2.stop()
    val recoveredRead = MgIngest.exactHeavyHitters(keyed, "k", idx)
      .as[(String, Long)].collect().toSeq
    assert(recoveredRead == want,
      s"recovered $recoveredRead vs batch $want")
  }
}
