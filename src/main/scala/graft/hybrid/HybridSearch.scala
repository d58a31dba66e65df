package graft.hybrid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted vector+graph fusion (reference O20, app.py:657-736) as ONE
  * composed DataFrame plan — Catalyst sees the whole query, unlike the
  * reference's separately-materialized passes.
  *
  * Semantics preserved exactly (SURVEY §7.3):
  *  - min-max normalize vector scores; all-equal degenerate case → 1.0
  *    (app.py:704-705)
  *  - nodes missing a vector score get 0.0 (app.py:721), i.e. they skip
  *    normalization entirely
  *  - graph score 0.0 for all when no start given
  *  - final = vw*vec_norm + gw*graph_score, drop final ≤ 0 (app.py:726 —
  *    silently drops the bottom-ranked vector node when graph signal is
  *    absent), sort desc with id tie-break, top-k
  *  - BM25 deliberately NOT fused (app.py:670-672)
  *
  * The min/max normalizers are 1-row aggregates broadcast into the plan —
  * no driver round-trip, no second pass over the data.
  */
object HybridSearch {

  /** @param nodes       (id) — the full node universe
    * @param vecScores   (id, vector_score) — nodes with embeddings, scored
    * @param graphScores (id, graph_score) or None when no start node given
    */
  /** @param roundTo when set, the final score is rounded to this many
    *                 decimals BEFORE the >0 filter and ordering (declared
    *                 queries use 6 for engine-exact oracle comparison;
    *                 the engine API leaves scores raw). */
  def fuse(nodes: DataFrame, vecScores: DataFrame,
           graphScores: Option[DataFrame],
           vectorWeight: Double, graphWeight: Double, topK: Int,
           idCol: String = "id", roundTo: Option[Int] = None): DataFrame = {
    val mm = vecScores.agg(
      min("vector_score").as("vmin"), max("vector_score").as("vmax"))
    val vn = vecScores.crossJoin(broadcast(mm))
      .select(col(idCol),
        when(col("vmax") === col("vmin"), 1.0)
          .otherwise((col("vector_score") - col("vmin")) /
            (col("vmax") - col("vmin"))).as("vec_norm"),
        col("vector_score"))

    val g = graphScores.getOrElse(
      nodes.select(col(idCol), lit(0.0).as("graph_score")).limit(0))

    nodes.select(col(idCol))
      .join(vn, Seq(idCol), "left")
      .join(g.select(col(idCol), col("graph_score")), Seq(idCol), "left")
      .na.fill(0.0, Seq("vec_norm", "vector_score", "graph_score"))
      .withColumn("final_score", {
        val f = lit(vectorWeight) * col("vec_norm") + lit(graphWeight) * col("graph_score")
        roundTo.fold(f)(d => round(f, d))
      })
      .filter(col("final_score") > 0)
      .orderBy(col("final_score").desc, col(idCol))
      .limit(topK)
  }

  /** Reciprocal Rank Fusion: rrf(d) = Σ_r 1/(k + rank_r(d)) over any
    * number of rankers. The reference's PDF *claims* RRF hybrid fusion but
    * its code never implements it (SURVEY authoritative-source note,
    * app.py:670-672) — provided here so the full claimed surface exists.
    * Each ranker is a (id, score) DataFrame; ranks are dense ROW_NUMBERs
    * over (round-6 score desc, id), so the fusion is deterministic even
    * with tied scores. Documents missing from a ranker contribute nothing
    * for that ranker (standard RRF).
    *
    * PRECONDITION (enforced): rankers must be pre-limited top-N lists (as
    * RRF inputs always are). Ranks come from ONE window partitioned by
    * ranker id — never a global single-partition window — and any ranker
    * longer than `maxInput` raises in-plan (raise_error fires during
    * execution, before a full-corpus ranker could silently serialize the
    * fusion). With >2 rankers the per-doc sum becomes order-sensitive in
    * the last ulp; round the result (roundTo) before comparing across
    * engines. */
  def rrfFuse(rankers: Seq[DataFrame], topK: Int, k: Int = 60,
              idCol: String = "id", roundTo: Option[Int] = None,
              maxInput: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = rankers.zipWithIndex.map { case (r, i) =>
      r.select(lit(i).as("rid"), col(idCol), col("score"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("rid"))
      .orderBy(round(col("score"), 6).desc, col(idCol))
    val contribs = tagged
      .withColumn("rank", row_number().over(w))
      .select(col(idCol),
        when(col("rank") > maxInput,
          raise_error(concat(lit("rrfFuse: ranker "), col("rid").cast("string"),
            lit(s" exceeds maxInput=$maxInput rows — pre-limit RRF inputs"))))
          .otherwise(lit(1.0) / (lit(k) + col("rank"))).as("contrib"))
    val fused = contribs.groupBy(idCol).agg(sum(col("contrib")).as("rrf"))
      .withColumn("rrf", roundTo.fold(col("rrf"))(d => round(col("rrf"), d)))
    fused.orderBy(col("rrf").desc, col(idCol)).limit(topK)
  }
}
