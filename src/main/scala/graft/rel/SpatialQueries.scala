package graft.rel

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-8 batch 3 (continued): spatial ε-neighborhood operators over a
  * 2-D projection of the embedding table — the grid-bucketed join
  * pattern every distributed spatial engine (and DBSCAN implementation)
  * is built on.
  *
  * Coordinates are EXACT integer micro-units: floor(dim·10⁶) — floor is
  * bit-identical in both engines (no round-half ambiguity), and all
  * distance arithmetic stays in int64 (|Δ| ≤ 2·10⁶ ⇒ Δ² ≤ 4·10¹², sums
  * well inside int64), so the pair set and distances hash-match with no
  * float anywhere.
  *
  * The 100 TB shape: bucket points into ε-sized grid cells, equi-join
  * each point's 3×3 neighbor-cell probes against the cell index, verify
  * the exact distance on candidates only — never all-pairs; candidate
  * volume is bounded by the densest cell (ε controls the grid, so skew
  * is a data-density property the cell size tunes). The DuckDB oracle is
  * an INDEPENDENT formulation — a coordinate range join (BETWEEN ±ε on
  * both axes, DuckDB's IEJoin) + exact filter — so the hash match checks
  * the grid logic against a different algorithm, not a mirror of it.
  */
object SpatialQueries {

  /** ε in micro-units (0.04 of embedding space) and its square. */
  private val Eps = 40000L
  private val Eps2 = Eps * Eps

  /** Points with exact integer micro-coordinates from the first two
    * embedding dims, plus their ε-grid cell (coords shifted non-negative
    * first: Spark's DIV truncates toward zero, DuckDB's // floors —
    * equal only on non-negatives). */
  private def pts(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "embeddings").select(
      col("vec_id"),
      floor(element_at(col("embedding"), 1).cast("double") * 1000000L)
        .cast("long").as("ix"),
      floor(element_at(col("embedding"), 2).cast("double") * 1000000L)
        .cast("long").as("iy"))
      .withColumn("cx", expr(s"(ix + 1000000) DIV $Eps"))
      .withColumn("cy", expr(s"(iy + 1000000) DIV $Eps"))

  private val ptsSql =
    """pts AS (
      |  SELECT vec_id,
      |         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS ix,
      |         CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS iy
      |  FROM embeddings)""".stripMargin

  /** All unordered point pairs within L2 distance ε, via the 3×3
    * neighbor-cell grid join. Each true pair is generated exactly once:
    * the probe offset that matches the partner's cell is unique, and
    * a_id < b_id kills the symmetric duplicate — no distinct needed. */
  val spatialGrid = QueryDef(
    "q_spatial_grid",
    (s, dir) => {
      import s.implicits._
      val p = pts(s, dir)
      val b = p.select($"vec_id".as("b_id"), $"ix".as("bx"), $"iy".as("by"),
        $"cx".as("bcx"), $"cy".as("bcy"))
      val offs = array(Seq(-1L, 0L, 1L).map(lit): _*)
      val probes = p
        .withColumn("ox", explode(offs)).withColumn("oy", explode(offs))
        .select($"vec_id".as("a_id"), $"ix".as("ax"), $"iy".as("ay"),
          ($"cx" + $"ox").as("bcx"), ($"cy" + $"oy").as("bcy"))
      probes.join(b, Seq("bcx", "bcy"))
        .filter($"a_id" < $"b_id")
        .withColumn("d2",
          ($"ax" - $"bx") * ($"ax" - $"bx") + ($"ay" - $"by") * ($"ay" - $"by"))
        .filter($"d2" <= Eps2)
        .select($"a_id", $"b_id", $"d2")
        .orderBy($"a_id", $"b_id")
    },
    Some(s"""WITH $ptsSql
             SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                    (a.ix - b.ix)*(a.ix - b.ix) + (a.iy - b.iy)*(a.iy - b.iy) AS d2
             FROM pts a JOIN pts b
               ON a.vec_id < b.vec_id
              AND b.ix BETWEEN a.ix - $Eps AND a.ix + $Eps
              AND b.iy BETWEEN a.iy - $Eps AND a.iy + $Eps
             WHERE (a.ix - b.ix)*(a.ix - b.ix) + (a.iy - b.iy)*(a.iy - b.iy) <= $Eps2
             ORDER BY a_id, b_id"""))

  /** DBSCAN core-point detection: points with ≥ minPts neighbors inside
    * ε — the density primitive under every DBSCAN variant; the cluster
    * step is ε-graph connected components, which q_graph_cc / the
    * q_dedup_cluster machinery already provides. Reuses the SAME grid
    * join, symmetrized, then a per-point count — so the cost profile is
    * the pair join plus one key-partitioned aggregation. */
  val spatialCore = QueryDef(
    "q_spatial_core",
    (s, dir) => {
      import s.implicits._
      val MinPts = 4
      val p = pts(s, dir)
      val b = p.select($"vec_id".as("b_id"), $"ix".as("bx"), $"iy".as("by"),
        $"cx".as("bcx"), $"cy".as("bcy"))
      val offs = array(Seq(-1L, 0L, 1L).map(lit): _*)
      val probes = p
        .withColumn("ox", explode(offs)).withColumn("oy", explode(offs))
        .select($"vec_id".as("a_id"), $"ix".as("ax"), $"iy".as("ay"),
          ($"cx" + $"ox").as("bcx"), ($"cy" + $"oy").as("bcy"))
      probes.join(b, Seq("bcx", "bcy"))
        .filter($"a_id" =!= $"b_id")
        .filter(($"ax" - $"bx") * ($"ax" - $"bx") +
          ($"ay" - $"by") * ($"ay" - $"by") <= Eps2)
        .groupBy($"a_id".as("vec_id")).agg(count(lit(1)).as("n_eps"))
        .filter($"n_eps" >= MinPts)
        .orderBy($"vec_id")
    },
    Some(s"""WITH $ptsSql
             SELECT a.vec_id AS vec_id, COUNT(*) AS n_eps
             FROM pts a JOIN pts b
               ON a.vec_id <> b.vec_id
              AND b.ix BETWEEN a.ix - $Eps AND a.ix + $Eps
              AND b.iy BETWEEN a.iy - $Eps AND a.iy + $Eps
             WHERE (a.ix - b.ix)*(a.ix - b.ix) + (a.iy - b.iy)*(a.iy - b.iy) <= $Eps2
             GROUP BY a.vec_id HAVING COUNT(*) >= 4
             ORDER BY a.vec_id"""))

  val all: Seq[QueryDef] = Seq(spatialGrid, spatialCore)
}
