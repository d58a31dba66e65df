package graft

import graft.api.Engine
import graft.store.TableCatalog

/** SURVEY §7.5.4 degenerate cases: empty store, dim-mismatch skip,
  * user-supplied arbitrary-dim vectors (app.py:398-399, 407-408, 762-764). */
class EdgeCaseSpec extends SparkSpec {

  test("empty store: every search returns empty, stats all zero") {
    val e = new Engine(new TableCatalog(spark))
    assert(e.vectorSearch("anything").isEmpty)
    assert(e.bm25Search("anything").isEmpty)
    assert(e.hybridSearch("anything").get.isEmpty)
    assert(e.graphSearch("nope").isEmpty, "missing start → 404 even on empty store")
    assert(e.stats() == graft.model.Stats(0, 0, 0))
  }

  test("dim-mismatched vectors are skipped at query time (app.py:407-408)") {
    val e = new Engine(new TableCatalog(spark))
    val a = e.createNode("normal auto-embedded node")           // dim 256
    val b = e.createNode("explicit short vector node",
      embedding = Some(Seq(1.0f, 0.0f, 0.0f)))                 // dim 3
    assert(b.embedding.get.length == 3, "arbitrary user dims accepted")
    val hits = e.vectorSearch("normal auto-embedded node", topK = 100)
    assert(hits.exists(_.id == a.id))
    assert(!hits.exists(_.id == b.id), "mismatched dim must be skipped, not scored")
    assert(e.stats().nodesWithEmbeddings == 2, "skipped ≠ deleted")
  }

  test("bm25 on empty/whitespace query returns empty") {
    val e = new Engine(new TableCatalog(spark))
    e.createNode("some content here")
    assert(e.bm25Search("   ").isEmpty)
  }

  test("LSH ANN/dedup on empty inputs return empty frames, not exceptions") {
    import spark.implicits._
    val emptyEmb = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val someEmb = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    // no queries: dim underivable → empty result with the contract schema
    val noQ = graft.pipeline.Similarity.lshTopK(
      someEmb, emptyEmb, "vec_id", "embedding", k = 5)
    assert(noQ.columns.toSeq == Seq("qid", "cid", "cos", "rn") && noQ.isEmpty)
    // empty corpus: no candidate pairs
    val noPairs = graft.pipeline.Dedup.embeddingCosineLsh(
      emptyEmb, "vec_id", "embedding", topK = 5)
    assert(noPairs.columns.toSeq == Seq("a", "b", "cos") && noPairs.isEmpty)
  }
}
