package graft

import graft.api.Engine
import graft.functions.vec
import graft.model.{EdgeRow, EmbeddingRow, Node}
import graft.store.TableCatalog
import org.apache.spark.sql.functions._

/** Bulk-load path: the fixture corpus loaded straight into the catalog (no
  * per-row mutations) and served by the engine — the shape a 100 TB
  * deployment uses (parquet → snapshots → searches). */
class EngineBulkSpec extends SparkSpec {
  import spark.implicits._

  test("bulk-loaded documents corpus serves vector/bm25/graph/hybrid") {
    val docs = Tables(spark, sf, "documents")
    val nodes = docs.select(
      concat(lit("doc-"), $"doc_id").as("id"), $"text",
      map(lit("lang"), $"lang", lit("source"), $"source").as("metadata"),
      lit("2024-01-01T00:00:00Z").as("created_at"),
      lit("2024-01-01T00:00:00Z").as("updated_at"))
    val embeddings = docs.select(
      concat(lit("doc-"), $"doc_id").as("node_id"),
      vec.hashEmbed($"text", 256).as("vector"), lit(256).as("dim"))
    val edges = docs.filter($"doc_id" < 100).select(
      concat(lit("e-"), $"doc_id").as("id"),
      concat(lit("doc-"), $"doc_id").as("source"),
      concat(lit("doc-"), ($"doc_id" * 7 + 13) % 500).as("target"),
      lit("ring").as("etype"), (lit(1.0) + $"doc_id" % 5).as("weight"),
      lit("2024-01-01T00:00:00Z").as("created_at"))

    val catalog = new TableCatalog(spark)
    catalog.load(nodes, embeddings, edges)
    val engine = new Engine(catalog)

    val st = engine.stats()
    assert(st.totalNodes == 500 && st.nodesWithEmbeddings == 500 && st.totalEdges == 100)

    val all = engine.getAllNodes()
    assert(all.size == 500 && all.forall(_._3.contains("lang")))

    val hits = engine.vectorSearch("spark join query data", topK = 10)
    assert(hits.size == 10 && hits.head.vectorScore > 0)
    assert(hits.map(_.vectorScore) == hits.map(_.vectorScore).sorted.reverse)

    val filtered = engine.vectorSearch("spark join", topK = 10,
      metadataFilter = Map("lang" -> "de"))
    assert(filtered.nonEmpty && filtered.forall(_.metadata("lang") == "de"))

    // 'dup' is the corpus's only rare term — common-only queries legitimately
    // score ≤ 0 under rank_bm25's negative epsilon floor (see VectorQueries)
    val kw = engine.bm25Search("dup spark", topK = 10)
    assert(kw.size == 10 && kw.forall(_.score > 0))

    val g = engine.graphSearch("doc-0", depth = 2).get
    assert(g.nodes.map(_.id).toSet == Set("doc-13", "doc-104"))

    val hy = engine.hybridSearch("spark join query data",
      graphStartId = Some("doc-0"), topK = 20).get
    assert(hy.size == 20)
    hy.foreach(h => assert(
      math.abs(h.finalScore - (0.7 * h.vectorScore + 0.3 * h.graphScore)) < 1e-6))
  }
}
