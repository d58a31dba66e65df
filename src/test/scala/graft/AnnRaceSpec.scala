package graft

import graft.api.{AnnMode, Engine}
import graft.functions.HashEmbed
import graft.model.{EmbeddingRow, Node}
import graft.store.TableCatalog
import org.apache.spark.sql.functions._

/** Regression coverage for the r13 AnnMode flake: an approximate serving
  * call (TrainedIvf) intermittently returned EMPTY versus 5 brute-force
  * hits under full-suite runs, passing on isolated re-run.
  *
  * Root cause (not a suite-load race): the quantizer trainer keyed the
  * corpus by raw `xxhash64(node_id)` and kmeansCentroids picked seeds via
  * `key % spacing == 0` — over random-UUID ids the seed set is empty with
  * P ≈ (1 − 1/s)^n ≈ e^(−√n) (~2% on the EngineSpec fixture), giving an
  * empty centroid table → empty candidates → empty result. Fresh UUIDs per
  * run made isolated re-runs pass. The fix is structural (TakeOrdered
  * seeds, ≥ 1 whenever the corpus is non-empty) plus a serving invariant
  * (empty candidate set ⇒ brute-force fallback, counted) plus an atomic
  * train memo. */
class AnnRaceSpec extends SparkSpec {
  import spark.implicits._

  private def seed(eng: Engine, cat: TableCatalog, ids: Seq[String]): Unit =
    ids.foreach { id =>
      val v = HashEmbed.encode(s"adversarial corpus text $id", eng.dim).toSeq
      cat.upsertNode(Node(id, s"adversarial corpus text $id", Map.empty,
        "2026-01-01T00:00:00", "2026-01-01T00:00:00"))
      cat.upsertEmbedding(EmbeddingRow(id, v, v.length))
    }

  test("AnnRace: trained quantizer serves on hash-adversarial ids " +
      "(the exact layout that emptied the legacy seed rule)") {
    val cat = new TableCatalog(spark)
    val eng = new Engine(cat)
    // 9 nodes ⇒ legacy spacing ⌈√9⌉ = 3. Choose ids whose xxhash64 is NOT
    // ≡ 0 (mod 3): under the legacy rule this corpus trains ZERO seeds.
    val ids = spark.range(0, 512)
      .select(concat(lit("adv-"), $"id".cast("string")).as("id"))
      .withColumn("h", xxhash64($"id"))
      .filter(pmod($"h", lit(3L)) =!= 0)
      .limit(9).select("id").as[String].collect().toSeq
    assert(ids.size == 9)
    seed(eng, cat, ids)
    val base = eng.vectorSearch("adversarial corpus text", topK = 5)
    val ivf = eng.vectorSearch("adversarial corpus text", topK = 5,
      mode = AnnMode.TrainedIvf(nprobe = 64))
    assert(base.size == 5)
    assert(ivf == base, s"TrainedIvf(all cells) must equal brute force:\n$ivf\n$base")
    // the quantizer itself must be healthy — the brute-force fallback is a
    // safety net, not the fix
    assert(eng.annFallbackCount == 0,
      "quantizer trained empty and only the fallback saved the query")
    assert(eng.quantizerTrainCount == 1)
  }

  test("AnnRace: TrainedIvf serving under concurrent mutation never " +
      "returns empty and never throws") {
    val cat = new TableCatalog(spark)
    val eng = new Engine(cat)
    (1 to 12).foreach(i => eng.createNode(s"race corpus doc $i"))
    @volatile var stop = false
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val mutator = new Thread(() => {
      var i = 0
      while (!stop) {
        try {
          val n = eng.createNode(s"race churn $i")
          eng.deleteNode(n.id)
        } catch { case t: Throwable => errs.add(t); stop = true }
        i += 1
      }
    })
    mutator.start()
    try {
      (1 to 8).foreach { _ =>
        // versions churn constantly, so most iterations retrain; every
        // answer must cover the stable 12-doc corpus regardless of which
        // snapshot the training raced against
        val hits = eng.vectorSearch("race corpus doc", topK = 5,
          mode = AnnMode.TrainedIvf(nprobe = 64))
        assert(hits.nonEmpty,
          "approximate serving returned empty on a non-empty corpus")
      }
    } finally { stop = true; mutator.join() }
    assert(errs.isEmpty, s"mutator thread failed: ${errs.peek()}")
  }
}
