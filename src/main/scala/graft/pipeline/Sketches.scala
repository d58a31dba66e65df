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

  /** KMV set-operation estimates over two keyed sets (Beyer et al.,
    * SIGMOD 2007): each side keeps its k smallest distinct hashes (via
    * orderBy+limit → TakeOrderedAndProject, per-partition heaps — never a
    * single-partition window); the UNION sketch is the k smallest of the
    * combined minima (the defining KMV mergeability), estimating
    * |A∪B| ≈ (k−1)·P DIV h_k; the INTERSECTION estimate scales the union
    * estimate by ρ = |{x ∈ K(A∪B) : x ∈ K(A) ∧ x ∈ K(B)}| / |K(A∪B)|.
    * Integer arithmetic end to end, so both estimates are bit-identical
    * in any engine and under any partitioning. Returns one row
    * (est_union, est_intersect). */
  def kmvSetOps(a: DataFrame, b: DataFrame, keyCol: String, k: Int): DataFrame = {
    def minima(df: DataFrame): DataFrame = df
      .select(TextOps.strHash(col(keyCol).cast("string")).as("h"))
      .distinct().orderBy(col("h")).limit(k)
    val ka = minima(a).localCheckpoint()
    val kb = minima(b).localCheckpoint()
    val ku = ka.unionByName(kb).distinct().orderBy(col("h")).limit(k)
      .localCheckpoint()
    val stats = ku.agg(count(lit(1)).as("m"), max(col("h")).as("hk"))
    val both = ku.join(ka, Seq("h"), "left_semi").join(kb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("i"))
    // m < k ⇒ the union sketch holds EVERY distinct hash, so est_union = m
    // and ρ·U = i·m/m = i — both estimates collapse to the exact values
    stats.join(both)
      .select(
        when(col("m") < k, col("m"))
          .otherwise(expr(s"(${(k - 1).toLong} * ${TextOps.P}L) DIV hk"))
          .as("est_union"),
        col("m"), col("i"))
      .select(col("est_union"),
        expr("(i * est_union) DIV m").as("est_intersect"))
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

  /** Mergeable fixed-width histogram quantiles, with the exact quantile
    * located through the SAME sketch — the two-phase distributed quantile:
    *
    * Phase 1 (the sketch): one groupBy on bucket id `x DIV width` —
    * integer counts, mergeable and order-independent, the form 1000
    * executors can partial-aggregate map-side. The estimate for fraction
    * num/den is the UPPER EDGE of the first bucket whose cumulative count
    * reaches rank r = ⌈n·num/den⌉ (type-1), so est − exact ∈ [1, width]
    * by construction — the histogram's deterministic error bound.
    *
    * Phase 2 (exact, still distributed): the rank-r value is the
    * (r − cum_before)-th smallest WITHIN the located bucket, found by a
    * window PARTITIONED BY bucket over only the selected buckets' rows —
    * never a global sort of the data. The cumulative prefix runs over the
    * histogram table itself (≤ value-range/width rows — a tiny broadcast),
    * not over data rows.
    *
    * `values` must be integer units (pre-scale floats — e.g. cents) and
    * non-negative: both engines truncate integer division toward zero, so
    * negative values would mis-bucket identically but break the
    * upper-edge bound. All arithmetic is integral — the output is
    * hash-exact in any engine. Quantile fractions are (num, den) integer
    * pairs for the same reason (0.9 has no exact binary form; 9/10 does).
    * Returns (num, den, qrank, exact, est, err) — err = est − exact,
    * spec-asserted ∈ [1, width]. */
  def histogramQuantiles(values: DataFrame, valCol: String, width: Long,
                         quantiles: Seq[(Int, Int)]): DataFrame = {
    require(width >= 1, s"bucket width must be >= 1 (got $width)")
    val v = values.select(col(valCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val hist = v.groupBy(expr(s"x DIV ${width}L").as("b"))
      .agg(count(lit(1)).as("c"))
    val sel = selectedBuckets(hist, quantiles)
    // phase 2: local rank within selected buckets only
    val selB = sel.select(col("b")).distinct()
    val wB = Window.partitionBy(col("b")).orderBy(col("x"))
    val inB = v.withColumn("b", expr(s"x DIV ${width}L"))
      .join(broadcast(selB), "b")
      .withColumn("lr", row_number().over(wB))
    broadcast(sel)
      .join(inB, sel("b") === inB("b") &&
        col("lr") === col("qrank") - col("cum_before"))
      .select(col("num"), col("den"), col("qrank"),
        col("x").as("exact"),
        ((sel("b") + 1L) * width).as("est"),
        ((sel("b") + 1L) * width - col("x")).as("err"))
  }

  /** Per-GROUP two-phase distributed quantiles — [[histogramQuantiles]]
    * keyed by a group column, the per-tenant/per-partition percentile
    * report a lake-scale pipeline emits in one pass: phase 1 is a single
    * (g, bucket) integer groupBy (map-side partial-aggregable); the
    * cumulative prefix is a window PARTITIONED BY g over the per-group
    * histogram table itself (≤ groups·range/width rows, never data
    * rows); phase 2 ranks only the selected buckets' rows with a window
    * partitioned by (g, bucket). All arithmetic integral, so exact and
    * estimate both hash-match. Returns (g, num, den, qrank, exact, est,
    * err ∈ [1, width]). */
  def histogramQuantilesByGroup(values: DataFrame, grpCol: String,
                                valCol: String, width: Long,
                                quantiles: Seq[(Int, Int)]): DataFrame = {
    require(width >= 1, s"bucket width must be >= 1 (got $width)")
    require(quantiles.nonEmpty && quantiles.forall { case (num, den) =>
      num >= 1 && den >= 1 && num <= den },
      s"quantile fractions must satisfy 1 <= num <= den: $quantiles")
    val spark = values.sparkSession
    import spark.implicits._
    val v = values.select(col(grpCol).as("g"), col(valCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val hist = v.groupBy(col("g"), expr(s"x DIV ${width}L").as("b"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("b"))
    val cum = hist.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("cum_before", col("cum") - col("c"))
    val n = hist.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val qr = n.crossJoin(broadcast(quantiles.toDF("num", "den")))
      .withColumn("qrank", expr("(n * num + den - 1) DIV den"))
    val wSel = Window.partitionBy(col("g"), col("num"), col("den"))
      .orderBy(col("b"))
    val sel = qr.join(cum, Seq("g"))
      .filter(col("cum") >= col("qrank"))
      .withColumn("rn", row_number().over(wSel)).filter(col("rn") === 1)
      .select(col("g"), col("num"), col("den"), col("qrank"),
        col("b"), col("cum_before"))
    val selB = sel.select(col("g"), col("b")).distinct()
    val wB = Window.partitionBy(col("g"), col("b")).orderBy(col("x"))
    val inB = v.withColumn("b", expr(s"x DIV ${width}L"))
      .join(broadcast(selB), Seq("g", "b"))
      .withColumn("lr", row_number().over(wB))
    broadcast(sel).join(inB, Seq("g", "b"))
      .filter(col("lr") === col("qrank") - col("cum_before"))
      .select(col("g"), col("num"), col("den"), col("qrank"),
        col("x").as("exact"),
        ((col("b") + 1L) * width).as("est"),
        ((col("b") + 1L) * width - col("x")).as("err"))
  }

  /** Quantile ESTIMATES from an already-maintained histogram (b, c) —
    * the read path of the STREAMING sketch (streaming.HistogramIngest):
    * when only the sketch is retained (the point of a sketch at 100 TB —
    * the raw values are gone), the estimate is the located bucket's
    * upper edge, within one width of the true quantile by the same
    * argument as [[histogramQuantiles]]. StreamingSpec pins these
    * estimates equal to the batch sketch's `est` column on the same
    * data. Returns (num, den, qrank, est). */
  def quantileEstimatesFromHist(hist: DataFrame, width: Long,
                                quantiles: Seq[(Int, Int)]): DataFrame = {
    require(width >= 1, s"bucket width must be >= 1 (got $width)")
    selectedBuckets(hist, quantiles)
      .select(col("num"), col("den"), col("qrank"),
        ((col("b") + 1L) * width).as("est"))
  }

  /** Shared bucket location: for each (num, den) fraction over histogram
    * (b, c), the first bucket whose cumulative count reaches rank
    * ⌈n·num/den⌉, with its cum_before. The cumulative prefix runs over
    * the HISTOGRAM table (tiny — ≤ value-range/width rows; the b2 ≤ b
    * theta-join is a tiny-side broadcast-NL), never data rows. */
  private def selectedBuckets(hist: DataFrame,
                              quantiles: Seq[(Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall { case (num, den) =>
      num >= 1 && den >= 1 && num <= den },
      s"quantile fractions must satisfy 1 <= num <= den: $quantiles")
    val spark = hist.sparkSession
    import spark.implicits._
    val cum = hist.as("h")
      .join(broadcast(hist.select(col("b").as("b2"), col("c").as("c2"))),
        col("b2") <= col("b"))
      .groupBy(col("b"))
      .agg(sum(col("c2")).as("cum"),
        sum(when(col("b2") < col("b"), col("c2")).otherwise(0L)).as("cum_before"))
    val n = hist.agg(sum(col("c")).as("n"))
    val qr = quantiles.toDF("num", "den")
      .crossJoin(broadcast(n))
      .withColumn("qrank", expr("(n * num + den - 1) DIV den"))
      .select(col("num"), col("den"), col("qrank"))
    qr.join(broadcast(cum), col("cum") >= col("qrank"))
      .groupBy(col("num"), col("den"), col("qrank"))
      .agg(min(col("b")).as("b"))
      .join(cum.select(col("b"), col("cum_before")), "b")
  }
}
