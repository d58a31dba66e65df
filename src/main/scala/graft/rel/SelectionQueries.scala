package graft.rel

import graft.{QueryDef, Tables}
import graft.graph.Walks
import graft.pipeline.{Selection, TextOps}
import org.apache.spark.sql.functions._

/** Declared queries for training-data selection and corpus generation —
  * DSIR importance reweighting over the documents table and deterministic
  * random-walk corpora over the sparse bipartite graph (ScaleQueries'
  * fixture). Both are "generate training data from the lake" operators a
  * 100 TB pipeline runs downstream of dedup/quality.
  */
object SelectionQueries {

  private val P = TextOps.P
  private def hvSql(x: String) =
    s"CAST(('0x'||substr(md5($x),1,15)) AS BIGINT) % $P"
  private val toksSql =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""

  /** DSIR importance selection (Xie et al. NeurIPS 2023): documents from
    * sources src0/src1 define the target distribution; every document gets
    * the hashed-unigram importance log-ratio weight and the top 50 are
    * selected. The oracle replays the full estimator — hashed buckets,
    * Laplace-smoothed counts, one rounded log per bucket, exact decimal
    * document sums — so a hash match proves the entire selection pipeline,
    * not just the ranking. */
  val pipelineDsir = QueryDef(
    "q_pipeline_dsir",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val w = Selection.dsirWeights(docs, "doc_id", "text",
        $"source".isin("src0", "src1"), buckets = 128)
      docs.select($"doc_id", $"source")
        .join(w, Seq("doc_id"))
        .select($"doc_id", $"source", $"weight")
        .orderBy($"weight".desc, $"doc_id")
        .limit(50)
    },
    Some(s"""WITH toks AS (
             |  SELECT doc_id, source, unnest($toksSql) AS tok FROM documents),
             |bk AS (SELECT doc_id, source, (${hvSql("tok")}) % 128 AS b FROM toks),
             |counts AS (
             |  SELECT b, CAST(COUNT(*) AS BIGINT) AS craw,
             |         CAST(SUM(CASE WHEN source IN ('src0','src1') THEN 1 ELSE 0 END)
             |              AS BIGINT) AS ctgt
             |  FROM bk GROUP BY b),
             |tots AS (SELECT CAST(SUM(craw) AS BIGINT) AS traw,
             |                CAST(SUM(ctgt) AS BIGINT) AS ttgt FROM counts),
             |lr AS (
             |  SELECT b, CAST(round(ln((ctgt + 1) * (traw + 128) /
             |                          ((craw + 1) * (ttgt + 128))), 8)
             |                 AS DECIMAL(12,8)) AS lr
             |  FROM counts CROSS JOIN tots),
             |w AS (
             |  SELECT bk.doc_id, bk.source, CAST(SUM(lr.lr) AS DOUBLE) AS weight
             |  FROM bk JOIN lr ON bk.b = lr.b
             |  GROUP BY bk.doc_id, bk.source)
             |SELECT doc_id, source, weight FROM w
             |ORDER BY weight DESC, doc_id LIMIT 50""".stripMargin))

  /** Deterministic random-walk corpus (DeepWalk/node2vec shape with the
    * RNG replaced by the cross-engine hash): 4-step walks from the 10
    * smallest user nodes of the sparse bipartite graph. The oracle unrolls
    * the walk as four joins against the identically-ranked adjacency list
    * and replays the hash choice — walks are a pure function of the graph,
    * so both engines step to the same nodes. */
  val graphWalks = QueryDef(
    "q_graph_walks",
    (s, dir) => {
      import s.implicits._
      val edges = ScaleQueries.sparseEdges(s, dir)
      val seeds = edges.select($"src".as("wid")).distinct()
        .orderBy($"wid").limit(10)
      Walks.deterministicWalks(edges, seeds, steps = 4)
        .select($"wid", $"step", $"node")
        .orderBy($"wid", $"step")
    },
    Some {
      def stepCte(t: Int) =
        s"""w$t AS (
           |  SELECT p.wid, $t AS step, a.v AS node
           |  FROM w${t - 1} p JOIN adj a ON a.u = p.node
           |  WHERE a.r = (${hvSql(s"CAST(p.wid AS VARCHAR) || ':$t:' || CAST(a.u AS VARCHAR)")})
           |              % a.deg + 1)""".stripMargin
      s"""WITH ${ScaleQueries.eeCte},
         |adj AS (
         |  SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS r,
         |         COUNT(*) OVER (PARTITION BY u) AS deg
         |  FROM (SELECT DISTINCT u, v FROM ee)),
         |seeds AS (SELECT u AS wid FROM (SELECT DISTINCT u FROM e0) ORDER BY u LIMIT 10),
         |w0 AS (SELECT wid, 0 AS step, wid AS node FROM seeds),
         |${(1 to 4).map(stepCte).mkString(",\n")}
         |SELECT wid, CAST(step AS INT) AS step, node
         |FROM (SELECT * FROM w0 UNION ALL SELECT * FROM w1 UNION ALL
         |      SELECT * FROM w2 UNION ALL SELECT * FROM w3 UNION ALL
         |      SELECT * FROM w4)
         |ORDER BY wid, step""".stripMargin
    })

  /** Node2vec-biased second-order walk corpus (Walks.node2vecWalks) over
    * the event graph — chosen over the bipartite fixture because the
    * triangle ("stay close", weight 4) move class actually fires there;
    * return moves weigh 1, explore moves 2. 10 seed walkers, 4 steps.
    * The oracle unrolls every step: candidate classification is the same
    * (prev, x) edge left join, cumulative integer weights via the
    * per-walker window, and the hash draw r = H(wid:t:cur) mod Σw picks
    * the identical candidate — a hash match proves every biased choice. */
  val graphNode2vec = QueryDef(
    "q_graph_node2vec",
    (s, dir) => {
      import s.implicits._
      val ed = GraphQueries.eventEdges(s, dir)
        .filter($"src" =!= $"dst").select($"src", $"dst")
      val nodes = ed.select($"src".as("n"))
        .union(ed.select($"dst".as("n"))).distinct()
      val seeds = nodes.orderBy($"n").limit(10).select($"n".as("wid"))
      Walks.node2vecWalks(ed, seeds, steps = 4)
        .select($"wid", $"step", $"node")
        .orderBy($"wid", $"step")
    },
    Some {
      def hv(t: Int, nodeExpr: String) =
        hvSql(s"CAST(wid AS VARCHAR) || ':$t:' || CAST($nodeExpr AS VARCHAR)")
      def stepCtes(t: Int) =
        s"""c$t AS (
           |  SELECT f.wid, f.prev, f.node AS cur, a.v AS x, a.r,
           |         CASE WHEN a.v = f.prev THEN 1
           |              WHEN e.u IS NOT NULL THEN 4
           |              ELSE 2 END AS wt
           |  FROM f${t - 1} f JOIN adj a ON a.u = f.node
           |  LEFT JOIN und e ON e.u = f.prev AND e.v = a.v),
           |g$t AS (
           |  SELECT wid, cur, x, wt,
           |         SUM(wt) OVER (PARTITION BY wid ORDER BY r) AS cw,
           |         SUM(wt) OVER (PARTITION BY wid) AS tw
           |  FROM c$t),
           |f$t AS (
           |  SELECT wid, cur AS prev, x AS node FROM g$t
           |  WHERE (${hv(t, "cur")}) % tw >= cw - wt
           |    AND (${hv(t, "cur")}) % tw < cw)""".stripMargin
      s"""WITH ${GraphQueries.edgesCte},
         |und AS MATERIALIZED (
         |  SELECT DISTINCT u, v FROM (
         |    SELECT src AS u, dst AS v FROM edges WHERE src <> dst
         |    UNION ALL
         |    SELECT dst AS u, src AS v FROM edges WHERE src <> dst)),
         |adj AS MATERIALIZED (
         |  SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS r,
         |         COUNT(*) OVER (PARTITION BY u) AS deg
         |  FROM und),
         |seeds AS (SELECT u AS wid FROM (SELECT DISTINCT u FROM und)
         |          ORDER BY u LIMIT 10),
         |w0 AS (SELECT wid, 0 AS step, wid AS node FROM seeds),
         |f1 AS (SELECT p.wid, a.u AS prev, a.v AS node
         |       FROM w0 p JOIN adj a ON a.u = p.node
         |       WHERE a.r = (${hv(1, "a.u")}) % a.deg + 1),
         |${(2 to 4).map(stepCtes).mkString(",\n")}
         |SELECT wid, CAST(step AS INT) AS step, node FROM (
         |  SELECT wid, step, node FROM w0
         |  UNION ALL SELECT wid, 1 AS step, node FROM f1
         |  UNION ALL SELECT wid, 2 AS step, node FROM f2
         |  UNION ALL SELECT wid, 3 AS step, node FROM f3
         |  UNION ALL SELECT wid, 4 AS step, node FROM f4)
         |ORDER BY wid, step""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(pipelineDsir, graphWalks, graphNode2vec)
}
