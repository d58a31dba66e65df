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
}
