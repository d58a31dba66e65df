package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches.
  *
  * Spark's HLL++ (`approx_count_distinct`, used by q_sketch_agg) is
  * order-independent within Spark but its register layout is
  * implementation-specific, so no cross-engine oracle can check it. KMV
  * (k-minimum-values) fills that gap: built entirely from the cross-engine
  * md5 hash ([[TextOps.strHash]]) and integer arithmetic, its estimate is
  * bit-identical in any engine — an oracle-checkable sketch.
  */
object Sketches {

  /** KMV distinct-count estimate per group: hash the keys into [0, P),
    * keep each group's k smallest *distinct* hash values, and estimate
    *   |D| ≈ (k−1) · P / h_k        (h_k = k-th smallest hash)
    * with the exact count used when a group has fewer than k distinct
    * hashes. All arithmetic is integral (`DIV`), so the estimate is
    * deterministic and associative — merging per-partition k-minima loses
    * nothing, which is what makes KMV a mergeable sketch at 1000 executors.
    * Returns (group, kmv_est). */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int): DataFrame = {
    val hashes = df
      .select(col(groupCol).as("g"),
        TextOps.strHash(col(keyCol).cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    hashes.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy("g")
      .agg(count(lit(1)).as("m"), max(col("h")).as("hk"))
      .select(col("g").as(groupCol),
        when(col("m") < k, col("m"))
          .otherwise(expr(s"(${(k - 1).toLong} * ${TextOps.P}L) DIV hk"))
          .as("kmv_est"))
  }

  /** Count-Min sketch: depth×width counter table from the cross-engine
    * hash family ([[TextOps.minhashPerm]] over [[TextOps.strHash]]).
    * Counter updates are sums → mergeable and order-independent, so the
    * distributed sketch equals the sequential one exactly. Returns the
    * materialized table (d, bucket, c). */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    // hash BEFORE the depth-explode: md5 is the per-row cost, the affine
    // re-permutations after it are cheap
    df.select(TextOps.strHash(col(keyCol).cast("string")).as("h"))
      .select(col("h"), explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("d"), (TextOps.minhashPerm(col("h"), col("d")) % width).as("bucket"))
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Point-query the sketch for each probe key: est = min over rows of the
    * key's bucket counter — a guaranteed overcount (est ≥ true count),
    * within εN with high probability at width ≥ e/ε. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val h = TextOps.strHash(col(keyCol).cast("string"))
    val lookups = probes
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("d"), h.as("h"))
      .select(col(keyCol), col("d"),
        (TextOps.minhashPerm(col("h"), col("d")) % width).as("bucket"))
    lookups.join(cms, Seq("d", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }
}
