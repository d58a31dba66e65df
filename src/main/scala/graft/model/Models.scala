package graft.model

/** Engine data model (SURVEY.md §1.4): the reference's three SQLite tables
  * (app.py:84-124) as case-class-typed Datasets. Timestamps are ISO-8601
  * strings exactly like the reference (app.py:129); metadata is a flat
  * string map (the only usage the reference's API and tests exercise,
  * app.py:60, test_final.py:151). */
case class Node(
    id: String,
    text: String,
    metadata: Map[String, String],
    created_at: String,
    updated_at: String)

case class EmbeddingRow(
    node_id: String,
    vector: Seq[Float],
    dim: Int)

case class EdgeRow(
    id: String,
    source: String,
    target: String,
    etype: String,
    weight: Double,
    created_at: String)

// ---- API result shapes (reference response contracts, app.py:753-940) ----

case class EdgeInfo(id: String, source: String, target: String,
    etype: String, weight: Double)

/** GET /nodes/{id} enrichment (O3, app.py:163-202). */
case class NodeDetails(
    id: String, text: String, metadata: Map[String, String],
    created_at: String, updated_at: String,
    hasEmbedding: Boolean, embedding: Option[Seq[Float]],
    outgoing: Seq[EdgeInfo], incoming: Seq[EdgeInfo])

case class VectorHit(id: String, text: String, metadata: Map[String, String],
    vectorScore: Double)

case class Bm25Hit(id: String, score: Double)

case class GraphNodeHit(id: String, text: String, metadata: Map[String, String],
    distance: Int, pathWeight: Double)

/** GET /search/graph response (O19, app.py:591-642). */
case class GraphSearchResult(startId: String, depth: Int,
    edgeType: Option[String], nodes: Seq[GraphNodeHit], edges: Seq[EdgeInfo])

case class HybridHit(id: String, text: String,
    vectorScore: Double, graphScore: Double, finalScore: Double)

/** GET /stats (O23, app.py:929-940). */
case class Stats(totalNodes: Long, nodesWithEmbeddings: Long, totalEdges: Long)
