package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

/** Deterministic random-walk corpus generation (the DeepWalk / node2vec
  * positive-pair generator — Perozzi et al. KDD'14, Grover & Leskovec
  * KDD'16 — with the RNG replaced by a cross-engine hash so walks are
  * reproducible on any cluster and replayable by the SQL oracle).
  *
  * The neighbor choice at step t from node v for walker w is
  * `rank = H(w:t:v) mod deg(v)` over the node's neighbors ranked by id —
  * i.e. the walk is a pure function of (graph, walker, step). Each step is
  * ONE equi-join of the frontier against the ranked adjacency list: at
  * 100 TB the frontier is |walkers| rows and adjacency is |E| rows
  * partitioned by source node, so a T-step corpus is T shuffle-free
  * broadcast probes when the frontier is small, or T co-partitioned joins
  * when walkers blanket the graph. No driver-side state; the loop only
  * stacks plan nodes.
  */
object Walks {

  /** Ranked adjacency of the UNDIRECTED view of (src,dst) edges:
    * (u, v, r, deg) with r = 1-based rank of v among u's neighbors ordered
    * by id. The rank window partitions by u — never global. */
  def rankedAdjacency(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
    val byU = Window.partitionBy(col("u")).orderBy(col("v"))
    und.select(col("u"), col("v"),
      row_number().over(byU).as("r"),
      count(lit(1)).over(Window.partitionBy(col("u"))).as("deg"))
  }

  /** T-step hash-deterministic walks from `seeds` (wid = start node).
    * Returns (wid, step, node) for step = 0..steps. */
  def deterministicWalks(edges: DataFrame, seeds: DataFrame, steps: Int): DataFrame = {
    val adj = rankedAdjacency(edges)
    val w0 = seeds.select(col("wid"), lit(0).as("step"), col("wid").as("node"))
    val all = (1 to steps).scanLeft(w0) { (frontier, t) =>
      frontier
        .join(adj, frontier("node") === adj("u"))
        .filter(col("r") === TextOps.strHash(
          concat(col("wid").cast("string"), lit(":"), lit(t).cast("string"),
            lit(":"), col("u").cast("string"))) % col("deg") + lit(1))
        .select(col("wid"), lit(t).as("step"), col("v").as("node"))
    }
    all.reduce(_ unionAll _)
  }

  /** Node2vec-biased SECOND-ORDER walks (Grover & Leskovec KDD'16) with
    * the RNG replaced by the same cross-engine hash. From state
    * (prev = t, cur = v), candidate neighbor x of v draws an INTEGER
    * weight — `wRet` if x = t (the 1/p return move), `wTri` if (t, x) is
    * an edge (the stay-close move), `wOut` otherwise (the 1/q explore
    * move); integer weights make the cumulative ranges and the draw
    * r = H(wid:step:v) mod Σw exact in both engines, so every step is
    * replayable. Step 1 has no prev and falls back to the first-order
    * uniform rule — identical to [[deterministicWalks]] step 1.
    *
    * Per step this is: one frontier⋈adjacency equi-join, one
    * (prev, x)-keyed edge-existence left join (the triangle test as a
    * JOIN, not a per-node neighborhood scan), a cumulative-weight window
    * PARTITIONED BY walker (each walker holds one frontier row per step —
    * never a global window), and the range test r ∈ [cw − wt, cw) picks
    * exactly one candidate. State is |walkers| rows regardless of graph
    * size. Returns (wid, step, node) for step = 0..steps. */
  def node2vecWalks(edges: DataFrame, seeds: DataFrame, steps: Int,
                    wRet: Int = 1, wTri: Int = 4, wOut: Int = 2): DataFrame = {
    require(steps >= 1 && wRet >= 1 && wTri >= 1 && wOut >= 1,
      s"need steps >= 1 and positive integer weights, got ($steps, $wRet, $wTri, $wOut)")
    val adj = rankedAdjacency(edges).localCheckpoint()
    val exists = adj.select(col("u").as("pu"), col("v").as("px"))
    def hv(t: Int) = TextOps.strHash(
      concat(col("wid").cast("string"), lit(":"), lit(t).cast("string"),
        lit(":"), col("u").cast("string")))
    val w0 = seeds.select(col("wid"), lit(0).as("step"), col("wid").as("node"))
    // step 1: uniform (no prev yet) — carries (wid, prev, node) forward
    val f1 = w0.join(adj, w0("node") === adj("u"))
      .filter(col("r") === hv(1) % col("deg") + lit(1))
      .select(col("wid"), col("u").as("prev"), col("v").as("node"))
      .localCheckpoint()
    val rest = (2 to steps).scanLeft(f1) { (frontier, t) =>
      val cands = frontier.join(adj, frontier("node") === adj("u"))
        .join(exists,
          frontier("prev") === col("pu") && adj("v") === col("px"), "left")
        .select(col("wid"), col("prev"), col("u").as("cur"), col("v").as("x"),
          col("r"),
          when(col("v") === col("prev"), wRet)
            .when(col("px").isNotNull, wTri)
            .otherwise(wOut).as("wt"))
      val byW = Window.partitionBy(col("wid"))
      val g = cands
        .withColumn("cw", sum(col("wt")).over(byW.orderBy(col("r"))))
        .withColumn("tw", sum(col("wt")).over(byW))
        .withColumn("rr", TextOps.strHash(
          concat(col("wid").cast("string"), lit(":"), lit(t).cast("string"),
            lit(":"), col("cur").cast("string"))) % col("tw"))
      g.filter(col("rr") >= col("cw") - col("wt") && col("rr") < col("cw"))
        .select(col("wid"), col("cur").as("prev"), col("x").as("node"))
        .localCheckpoint()
    }
    val stepped = rest.zipWithIndex.map { case (f, i) =>
      f.select(col("wid"), lit(i + 1).as("step"), col("node"))
    }
    (w0 +: stepped).reduce(_ unionAll _)
  }
}
