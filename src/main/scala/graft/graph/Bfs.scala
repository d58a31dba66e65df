package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Depth-limited directed weighted BFS (reference O17, app.py:512-549) as
  * iterative DataFrame joins — every level is one frontier⋈edges join plus a
  * groupBy, all Catalyst-visible.
  *
  * Semantics (SURVEY §7.5.1, deliberate spec choice): `dist` is the exact
  * hop count; `path_weight` is the **max accumulated weight among
  * shortest paths** — the clean fixpoint of the reference's label rule
  * (min dist, then max weight at equal dist, app.py:540-544). The reference
  * does not re-propagate improved weights (queue-order artifact,
  * app.py:547); the clean semantics agrees on every graph its tests
  * exercise (chains, stars, 2-cycles) and is what the recursive-CTE oracle
  * computes, so the declared checks are self-consistent.
  *
  * Scale: frontier and visited are `localCheckpoint`ed per level (bounded
  * lineage); the edge table is persisted for the loop; each level's work is
  * one shuffle keyed on dst. The isolated-start short-circuit
  * (app.py:521-525) falls out naturally: an empty first frontier leaves
  * only the start row. Depth is assumed small (≤ ~10, as in all reference
  * workloads); deeper traversals should move to GraphX Pregel.
  */
object Bfs {

  /** @param edges DataFrame with `srcCol`, `dstCol`, `weightCol` (+ optional
    *              type column filtered by `edgeType`)
    * @param start literal Column of the same type as src/dst (e.g. lit(0L))
    * @return DataFrame(node, dist: int, path_weight: double)
    */
  def traverse(edges: DataFrame, start: Column, depth: Int,
               srcCol: String = "src", dstCol: String = "dst",
               weightCol: String = "weight",
               edgeType: Option[(String, String)] = None): DataFrame = {
    val spark = edges.sparkSession
    val e = edgeType.fold(edges) { case (c, t) => edges.filter(col(c) === t) }
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("double").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var visited = spark.range(1)
      .select(start.as("node"), lit(0).as("dist"), lit(0.0).as("path_weight"))
      .localCheckpoint()
    var frontier = visited
    var d = 0
    var done = false
    while (d < depth && !done) {
      d += 1
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), (frontier("path_weight") + e("w")).as("pw"))
        .join(visited.select("node"), Seq("node"), "left_anti")
        .groupBy("node")
        .agg(max("pw").as("path_weight"))
        .withColumn("dist", lit(d))
        .select("node", "dist", "path_weight")
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        visited = visited.unionByName(next)
        frontier = next
      }
    }
    e.unpersist()
    visited
  }
}
