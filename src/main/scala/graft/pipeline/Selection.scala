package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-data selection via importance weighting.
  *
  * Implements the DSIR shape (Xie et al., "Data Selection for Language
  * Models via Importance Resampling", NeurIPS 2023 — public algorithm):
  * estimate a target and a raw distribution over HASHED n-gram features,
  * score every raw document by its importance log-ratio, keep the
  * highest-weight documents. The hashed-feature trick is what makes the
  * estimator cluster-sized: both distributions are one groupBy over a
  * fixed bucket count B (map-side partial-aggregable at any scale), and
  * scoring is a broadcast join of the B-row log-ratio table against the
  * token stream — no vocabulary state, no model.
  *
  * Float discipline: the per-bucket log ratio is the ONLY transcendental —
  * computed once per bucket from exact integer counts (one IEEE division
  * of exact-in-double products, one log), rounded to 8 places and fixed
  * into DECIMAL(12,8); per-document sums are then exact decimal arithmetic,
  * so document ranks can never depend on summation order. Count products
  * stay below 2^53 up to ~90M tokens per side; beyond that, swap the
  * cross-product form for the two-division form (same determinism, smaller
  * magnitudes).
  */
object Selection {

  /** Per-document DSIR importance weight over hashed unigram buckets.
    *
    * @param isTarget row predicate marking the target (curated) slice —
    *                 the distribution documents are reweighted TOWARD.
    * @return (idCol, weight DOUBLE) — higher = more target-like. Laplace
    *         (+1) smoothing keeps buckets the target never hits finite.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 128): DataFrame = {
    val toks = docs
      .select(col(idCol), isTarget.as("is_t"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("b", TextOps.strHash(col("tok")) % buckets)
    val counts = toks.groupBy(col("b")).agg(
      count(lit(1)).as("craw"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ctgt"))
    val tots = counts.agg(sum(col("craw")).as("traw"), sum(col("ctgt")).as("ttgt"))
    val lr = counts.join(broadcast(tots))
      .select(col("b"),
        round(log((col("ctgt") + lit(1L)) * (col("traw") + lit(buckets.toLong)) /
          ((col("craw") + lit(1L)) * (col("ttgt") + lit(buckets.toLong)))), 8)
          .cast(DecimalType(12, 8)).as("lr"))
    toks.join(broadcast(lr), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("lr")).as("w_dec"))
      .select(col(idCol), col("w_dec").cast("double").as("weight"))
  }

  /** Water-filling quota allocation: given per-group sizes (keyCol, n)
    * and a total `budget`, find the cap c with Σ min(n_g, c) = budget —
    * groups under the cap keep everything (fit = 1), the surplus spreads
    * evenly over the over-cap groups with the integer remainder going to
    * the largest groups first. Returns (keyCol, n, fit, alloc) with
    * Σ alloc = min(budget, Σ n) exactly.
    *
    * Everything runs on the |groups|-row aggregate table in ALL-INTEGER
    * arithmetic: rank and cumulative via a tiny self-join (never a
    * partition-less window), the split point k* = the largest rank whose
    * group still fits fully (n·(K−k+1) + cum_{k−1} ≤ B — monotone in k,
    * so max is sound), cap and remainder by DIV/MOD. When every group
    * fits (budget ≥ Σ n) the k* = K guard keeps cap/rem at 0 and every
    * alloc = n. */
  def waterfillAlloc(groups: DataFrame, keyCol: String,
                     budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0 (got $budget)")
    val g2 = groups.select(col(keyCol).as("k2"), col("n").as("n2"))
    val ranked = groups.join(broadcast(g2),
        struct(col("n2"), col("k2")) <= struct(col("n"), col(keyCol)))
      .groupBy(col(keyCol), col("n"))
      .agg(count(lit(1)).as("rk"), sum(col("n2")).as("cum"))
    val kRow = groups.agg(count(lit(1)).as("kk"))
    val fitted = ranked.crossJoin(broadcast(kRow))
      .withColumn("fit",
        (col("n") * (col("kk") - col("rk") + 1) + (col("cum") - col("n"))
          <= budget).cast("int"))
    val star = fitted.agg(
      coalesce(max(when(col("fit") === 1, col("rk"))), lit(0L)).as("kstar"),
      coalesce(max(when(col("fit") === 1, col("cum"))), lit(0L)).as("cumstar"))
    fitted.crossJoin(broadcast(star))
      .withColumn("cap", when(col("kk") === col("kstar"), lit(0L))
        .otherwise(expr(s"(${budget}L - cumstar) DIV (kk - kstar)")))
      .withColumn("rem", when(col("kk") === col("kstar"), lit(0L))
        .otherwise(expr(s"(${budget}L - cumstar) % (kk - kstar)")))
      .withColumn("alloc", when(col("fit") === 1, col("n"))
        .otherwise(col("cap") +
          when(col("kk") - col("rk") + 1 <= col("rem"), 1L).otherwise(0L)))
      .select(col(keyCol), col("n"), col("fit"), col("alloc"))
  }
}
