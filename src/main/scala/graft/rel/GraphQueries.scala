package graft.rel

import graft.{QueryDef, Tables}
import graft.graph.{Bfs, GraphOps}
import graft.hybrid.HybridSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared graph + hybrid operator queries — SURVEY.md §2.B cats 11 & 14.
  *
  * The graph is derived deterministically from fixtures: an edge per
  * (user, k%15, event_type) with weight = MAX(value) — a directed, typed,
  * weighted multigraph over ≤15 nodes, exactly the reference's edge model
  * (parallel edges across types, app.py:110-121). The DuckDB oracle runs a
  * depth-bounded recursive CTE: all walks of length = min-dist are simple,
  * so MAX(pw) at min dist equals max-weight-among-shortest-paths
  * (SURVEY §7.5.1) and both engines accumulate each winning path's weight
  * left-to-right → bit-identical doubles.
  */
object GraphQueries {

  /** The shared derived edge table, Spark side. */
  private def eventEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"user_id".as("src"),
        (get_json_object($"props", "$.k").cast("long") % 15).as("dst"),
        $"event_type".as("etype"), $"value".as("w0"))
      .groupBy($"src", $"dst", $"etype")
      .agg(max($"w0").as("weight"))
      // one materialization per query: the derived edge table feeds both the
      // traversal loop and the induced-edge join; recomputing the JSON parse
      // + aggregation per consumer would double the dominant scan cost
      .localCheckpoint()
  }

  /** The same edge table, DuckDB side (CTE fragment). */
  private val edgesCte =
    """edges AS (
      |  SELECT user_id AS src,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) % 15 AS dst,
      |         event_type AS etype, MAX(value) AS w
      |  FROM events GROUP BY 1, 2, 3)""".stripMargin

  /** Depth-bounded BFS walk → (node, dist=min, pw=max at min dist). */
  private def bfsCte(depth: Int, typeFilter: Option[String]): String = {
    val src = typeFilter.fold("edges")(t => s"(SELECT * FROM edges WHERE etype = '$t')")
    s"""walk(node, dist, pw) AS (
       |  SELECT CAST(0 AS BIGINT), 0, CAST(0.0 AS DOUBLE)
       |  UNION ALL
       |  SELECT e.dst, w0.dist + 1, w0.pw + e.w
       |  FROM walk w0 JOIN $src e ON e.src = w0.node
       |  WHERE w0.dist < $depth),
       |lab AS (SELECT node, dist, pw, MIN(dist) OVER (PARTITION BY node) AS md FROM walk),
       |bfs AS (SELECT node, dist, MAX(pw) AS pw FROM lab WHERE dist = md GROUP BY node, dist)""".stripMargin
  }

  /** Untyped BFS, depth 3 from node 0 (O17; TC-GRAPH-01/03 shape). */
  val graphBfs = QueryDef(
    "q_graph_bfs",
    (s, dir) => {
      import s.implicits._
      Bfs.traverse(eventEdges(s, dir), lit(0L), depth = 3)
        .select($"node", $"dist", round($"path_weight", 6).as("path_weight"))
        .orderBy($"node")
    },
    Some(s"""WITH RECURSIVE $edgesCte, ${bfsCte(3, None)}
             SELECT node, dist, round(pw, 6) AS path_weight FROM bfs ORDER BY node"""))

  /** Type-filtered BFS (O16/O17 edge-type equality filter; TC-GRAPH-02). */
  val graphBfsTyped = QueryDef(
    "q_graph_bfs_typed",
    (s, dir) => {
      import s.implicits._
      Bfs.traverse(eventEdges(s, dir), lit(0L), depth = 3,
        edgeType = Some(("etype", "purchase")))
        .select($"node", $"dist", round($"path_weight", 6).as("path_weight"))
        .orderBy($"node")
    },
    Some(s"""WITH RECURSIVE $edgesCte, ${bfsCte(3, Some("purchase"))}
             SELECT node, dist, round(pw, 6) AS path_weight FROM bfs ORDER BY node"""))

  /** Closeness scoring over the traversal (O18) — the traversal-wide max
    * weight couples every node's score (1-row agg broadcast). */
  val graphScore = QueryDef(
    "q_graph_score",
    (s, dir) => {
      import s.implicits._
      val bfs = Bfs.traverse(eventEdges(s, dir), lit(0L), depth = 3)
      GraphOps.closeness(bfs, lit(0L), maxDepth = 3)
        .select($"node", $"dist", round($"path_weight", 6).as("path_weight"),
          round($"graph_score", 6).as("score"))
        .orderBy($"node")
    },
    Some(s"""WITH RECURSIVE $edgesCte, ${bfsCte(3, None)},
             mw AS (SELECT MAX(pw) AS max_w FROM bfs)
             SELECT node, dist, round(pw, 6) AS path_weight,
                    round(CASE WHEN node = 0 THEN 1.0
                               WHEN dist > 3 THEN 0.0
                               ELSE ((3 - dist + 1) / 4.0) *
                                    (CASE WHEN max_w > 0 THEN 0.5 + 0.5 * pw / max_w ELSE 1.0 END)
                          END, 6) AS score
             FROM bfs, mw ORDER BY node"""))

  /** Induced subgraph (O19): all edges with both endpoints visited —
    * NOT type-filtered (reference quirk, app.py:613-634). */
  val graphInduced = QueryDef(
    "q_graph_induced",
    (s, dir) => {
      import s.implicits._
      val edges = eventEdges(s, dir)
      val visited = Bfs.traverse(edges, lit(0L), depth = 2)
      GraphOps.inducedEdges(edges, visited)
        .select($"src", $"dst", $"etype", $"weight")
        .orderBy($"src", $"dst", $"etype")
    },
    Some(s"""WITH RECURSIVE $edgesCte, ${bfsCte(2, None)},
             vis AS (SELECT DISTINCT node FROM bfs)
             SELECT e.src, e.dst, e.etype, e.w AS weight FROM edges e
             WHERE e.src IN (SELECT node FROM vis) AND e.dst IN (SELECT node FROM vis)
             ORDER BY src, dst, etype"""))

  /** Full hybrid fusion pipeline (O20, cat 14): min-max-normalized vector
    * scores ⊕ BFS closeness from doc 0 over a deterministic doc ring graph,
    * 0.7/0.3 weights, final>0 filter, top-25. One composed Catalyst plan. */
  val hybrid = QueryDef(
    "q_hybrid",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents").select($"doc_id".as("id"))
      val vecScores = Tables(s, dir, "embeddings")
        .filter(size($"embedding") === 64)
        .select($"vec_id".as("id"),
          round(graft.functions.vec.dot($"embedding",
            typedlit(VectorQueries.queryVec)), 6).as("vector_score"))
      val ring = Tables(s, dir, "documents")
        .select($"doc_id".as("src"), (($"doc_id" * 7 + 13) % 500).as("dst"),
          (lit(1.0) + ($"doc_id" % 5)).as("weight"))
      val bfs = Bfs.traverse(ring, lit(0L), depth = 2)
      val g = GraphOps.closeness(bfs, lit(0L), maxDepth = 2)
        .select($"node".as("id"), $"graph_score")
      HybridSearch.fuse(docs, vecScores, Some(g),
        vectorWeight = 0.7, graphWeight = 0.3, topK = 25, roundTo = Some(6))
        .select($"id", round($"vec_norm", 6).as("vec_norm"),
          round($"graph_score", 6).as("graph_score"), $"final_score")
    },
    Some {
      val qv = VectorQueries.queryVec.map(_.toString).mkString("[", ", ", "]::DOUBLE[]")
      s"""WITH RECURSIVE
         |ring AS (SELECT doc_id AS src, (doc_id * 7 + 13) % 500 AS dst,
         |                1.0 + (doc_id % 5) AS w
         |         FROM documents),
         |walk(node, dist, pw) AS (
         |  SELECT CAST(0 AS BIGINT), 0, CAST(0.0 AS DOUBLE)
         |  UNION ALL
         |  SELECT e.dst, w0.dist + 1, w0.pw + e.w
         |  FROM walk w0 JOIN ring e ON e.src = w0.node WHERE w0.dist < 2),
         |lab AS (SELECT node, dist, pw, MIN(dist) OVER (PARTITION BY node) AS md FROM walk),
         |bfs AS (SELECT node, dist, MAX(pw) AS pw FROM lab WHERE dist = md GROUP BY node, dist),
         |mw AS (SELECT MAX(pw) AS max_w FROM bfs),
         |gs AS (SELECT node AS id,
         |              CASE WHEN node = 0 THEN 1.0
         |                   WHEN dist > 2 THEN 0.0
         |                   ELSE ((2 - dist + 1) / 3.0) *
         |                        (CASE WHEN max_w > 0 THEN 0.5 + 0.5 * pw / max_w ELSE 1.0 END)
         |              END AS graph_score
         |       FROM bfs, mw),
         |vs AS (SELECT vec_id AS id,
         |              round(list_dot_product(CAST(embedding AS DOUBLE[]), $qv), 6) AS v
         |       FROM embeddings WHERE len(embedding) = 64),
         |mm AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM vs),
         |vn AS (SELECT id, CASE WHEN vmax = vmin THEN 1.0
         |                       ELSE (v - vmin) / (vmax - vmin) END AS vn
         |       FROM vs, mm),
         |f AS (SELECT d.doc_id AS id,
         |             COALESCE(vn.vn, 0.0) AS vnv,
         |             COALESCE(gs.graph_score, 0.0) AS gsv
         |      FROM documents d
         |      LEFT JOIN vn ON vn.id = d.doc_id
         |      LEFT JOIN gs ON gs.id = d.doc_id)
         |SELECT id, round(vnv, 6) AS vec_norm, round(gsv, 6) AS graph_score,
         |       round(0.7 * vnv + 0.3 * gsv, 6) AS final_score
         |FROM f WHERE round(0.7 * vnv + 0.3 * gsv, 6) > 0
         |ORDER BY final_score DESC, id LIMIT 25""".stripMargin
    })

  val all: Seq[QueryDef] =
    Seq(graphBfs, graphBfsTyped, graphScore, graphInduced, hybrid)
}
