package graft.graph

import org.apache.spark.graphx.{Edge => GxEdge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GraphX-backed graph analytics — the scale path for whole-graph
  * computation (BASELINE.json north star: "graph analytics via GraphX").
  *
  * The DataFrame BFS in [[Bfs]] is the right tool for depth ≤ ~10 ego
  * traversals (Catalyst-visible, joins prunable); GraphX Pregel is the
  * right tool when the iteration count is unbounded (components, PageRank)
  * or the whole graph participates. Vertex ids here are the Long node ids
  * of the derived fixture graphs; string-keyed engine graphs map through
  * `xxhash64`/dense-rank first (SURVEY §1.4).
  */
object GraphXOps {

  /** Build a GraphX graph from an edge DataFrame (src, dst, weight). */
  def fromEdges(edges: DataFrame): Graph[Long, Double] = {
    val es = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("weight").cast("double"))
      .rdd.map(r => GxEdge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    Graph.fromEdges(es, defaultValue = 0L,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  /** Connected components (undirected closure) → (node, component) where
    * component = min node id reachable. Deterministic → oracle-checkable. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    fromEdges(edges).connectedComponents()
      .vertices.toDF("node", "component")
      .select($"node", $"component")
  }

  /** PageRank (damping 0.85) — float-iterative, so declared rows-only
    * (no cross-engine hash oracle); ranks are still deterministic within
    * the engine for a fixed iteration count. */
  def pageRank(edges: DataFrame, iters: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    fromEdges(edges).staticPageRank(iters)
      .vertices.toDF("node", "rank")
      .select($"node", round($"rank", 6).as("rank"))
  }

  /** Pregel single-source shortest-hop with max-weight tie-break — the
    * same label semantics as [[Bfs.traverse]] (min dist, then max
    * accumulated weight), run to fixpoint instead of a driver loop.
    * Returns only reached vertices (dist < unbounded depth). */
  def pregelBfs(edges: DataFrame, start: Long, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = fromEdges(edges)
    val init = (Int.MaxValue, 0.0)
    val bfs = g.mapVertices((id, _) => if (id == start) (0, 0.0) else init)
      .pregel(init, maxIterations = maxDepth)(
        vprog = (_, attr, msg) =>
          if (msg._1 < attr._1 || (msg._1 == attr._1 && msg._2 > attr._2)) msg
          else attr,
        sendMsg = t => {
          val (d, w) = t.srcAttr
          if (d == Int.MaxValue || d >= maxDepth) Iterator.empty
          else {
            val cand = (d + 1, w + t.attr)
            val (dd, dw) = t.dstAttr
            if (cand._1 < dd || (cand._1 == dd && cand._2 > dw))
              Iterator((t.dstId, cand))
            else Iterator.empty
          }
        },
        mergeMsg = (a, b) =>
          if (a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)) a else b)
    bfs.vertices
      .filter { case (_, (d, _)) => d != Int.MaxValue }
      .map { case (id, (d, w)) => (id, d, w) }
      .toDF("node", "dist", "path_weight")
  }
}
