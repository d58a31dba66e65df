package graft.pipeline

import graft.functions.vec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers (SURVEY cat 12 scale path):
  *  - brute-force: exact, one corpus scan per query batch (queries
  *    broadcast) — `graft.search.VectorSearch` / `rel.VectorQueries.vecKnn`
  *  - sign-LSH buckets (here): 2^H random-hyperplane buckets; queries probe
  *    only their own bucket, cutting scan work ~2^H× at recall < 1. The
  *    bucket id is a plain int column → candidate generation is an
  *    equi-join shuffle, the Spark-native IVF analog.
  */
object Similarity {

  /** Codebooks plateau at this size: industrial PQ/IVF fixes the codeword
    * count (256–4096) independent of n, because k growing with n makes
    * assignment work n·k superlinear — at ⌈√n⌉ spacing the trained family
    * was O(n^1.5) total (q_ann_opq measured 13.9× wall at 10× rows before
    * the cap). 256 = one PQ code byte, the standard choice. The cap only
    * binds above n = kMax² = 65,536 rows, so every fixture hash
    * (sf0.001 … sf1, max 50k docs / 20k embeddings) is unchanged. */
  val kMax = 256L

  /** Codebook/centroid spacing WITHOUT a per-call count job when the
    * caller already knows n: every spaced-quantizer entry point takes an
    * optional `corpusN` so the serving layer can pass the (memoized)
    * corpus row count instead of paying a count job per query — at scale
    * that count is an extra scheduling round-trip before planning. Only an
    * unparameterized ad-hoc call still counts.
    *
    * Rule: `max(⌈√n⌉, ⌈n/kMax⌉)` — √n codewords below the plateau (small
    * corpora keep fine-grained codebooks), a CONSTANT kMax codewords
    * above it, so assignment work is O(n·kMax) = linear at scale. Both
    * terms are portable across engines: IEEE sqrt and a single division
    * are correctly rounded, so the oracle's
    * `greatest(ceil(sqrt(n)), ceil(n/256.0))` is bit-identical. */
  private def sqrtSpacing(corpus: DataFrame, explicitEvery: Long,
                          corpusN: Long): Long =
    if (explicitEvery > 0) explicitEvery
    else {
      val n = (if (corpusN > 0) corpusN else corpus.count()).toDouble
      math.max(math.ceil(math.sqrt(n)), math.ceil(n / kMax.toDouble)).toLong
    }

  /** H fixed hyperplanes with exact-quarter components — deterministic
    * across engines (no RNG; values in {-3/4..3/4} are exact doubles). */
  def hyperplanes(h: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(h)(b => Seq.tabulate(dim)(j => (((j * (b + 3) + b) % 7) - 3) / 4.0))

  /** Bucket id: bit b set iff dot(v, plane_b) > 0. */
  def bucketCol(vecCol: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(vec.dot(vecCol, typedlit(p)) > 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed top-k: per query, rank only same-bucket candidates by
    * cosine. `probeRadius` = 1 additionally probes every bucket within
    * hamming distance 1 of the query's bucket (multi-probe LSH: recall
    * approaches brute force at (H+1)× the candidate cost instead of 2^H×).
    * `dim` ≤ 0 derives the true dimension from the query set (one tiny
    * job over the already-small broadcast side) — hyperplanes MUST span
    * the full vector or bucketing silently degrades to a prefix hash.
    * Returns (qid, cid, cos, rn). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int = 4,
              probeRadius: Int = 0, roundTo: Int = 6,
              dim: Int = 0): DataFrame =
    lshScored(corpus, queries, idCol, vecCol, numPlanes, probeRadius,
        roundTo, dim) match {
      case None => // no queries (or 0-dim vectors): empty result, right schema
        corpus.sparkSession.emptyDataFrame
          .select(lit(0L).as("qid"), lit(0L).as("cid"),
            lit(0.0).as("cos"), lit(0).as("rn")).limit(0)
      case Some(sc) =>
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("cid"))
        sc.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
          .select(col("qid"), col("cid"), col("cos"), col("rn"))
    }

  /** Radius (range) search: every same/probed-bucket candidate with
    * cosine ≥ `minCos` — "all near-duplicates of these queries", the
    * retrieval mode dedup and contamination sweeps use where top-k's
    * fixed cutoff either truncates dense neighborhoods or pads sparse
    * ones. Same candidate generation as [[lshTopK]] (bucket equi-join,
    * no window at all — cheaper: a scan-side filter replaces the per-query
    * rank). Returns (qid, cid, cos). */
  def lshRange(corpus: DataFrame, queries: DataFrame, idCol: String,
               vecCol: String, minCos: Double, numPlanes: Int = 4,
               probeRadius: Int = 0, roundTo: Int = 6,
               dim: Int = 0): DataFrame =
    lshScored(corpus, queries, idCol, vecCol, numPlanes, probeRadius,
        roundTo, dim) match {
      case None =>
        corpus.sparkSession.emptyDataFrame
          .select(lit(0L).as("qid"), lit(0L).as("cid"),
            lit(0.0).as("cos")).limit(0)
      case Some(sc) =>
        sc.filter(col("cos") >= minCos)
          .select(col("qid"), col("cid"), col("cos"))
    }

  /** Shared LSH candidate generation + exact rescore: (qid, cid, cos) for
    * every candidate sharing a (probed) bucket with a query. None when the
    * query side is empty/0-dim (hyperplane dim underivable). */
  private def lshScored(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, numPlanes: Int, probeRadius: Int,
                        roundTo: Int, dim: Int): Option[DataFrame] = {
    val trueDim =
      if (dim > 0) dim
      else queries.select(size(col(vecCol)).as("d")).head(1)
        .headOption.map(_.getInt(0)).getOrElse(0)
    if (trueDim == 0) return None
    val planes = hyperplanes(numPlanes, trueDim)
    val c = TextOps.spread(corpus)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"),
        bucketCol(col(vecCol), planes).as("bucket"))
    val qBucket = bucketCol(col(vecCol), planes)
    val probes: Column =
      if (probeRadius == 0) array(qBucket)
      else array(qBucket +: (0 until numPlanes)
        .map(b => qBucket.bitwiseXOR(1L << b)): _*)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        explode(probes).as("bucket"))
    Some(c.join(broadcast(q), "bucket")
      .withColumn("cos", round(vec.cosine(col("cv"), col("qv")), roundTo)))
  }

  /** Product-quantization ANN (asymmetric distance): split each vector
    * into `m` subvectors; per subspace, quantize to the nearest codeword
    * (deterministic ⌈√n⌉-spaced codebook, same no-RNG rule as [[ivfTopK]];
    * swap in trained k-means codebooks at production scale); score a query
    * as Σ_s dot(q_s, codeword(v, s)) — the table-lookup ADC that stores
    * only m int codes per vector (the memory form billion-vector indexes
    * actually ship).
    *
    * Shape at scale: assignment is corpus×m rows joined against a
    * BROADCAST codebook (n·m·√n distance rows, no all-pairs anywhere);
    * per-(vector,subspace) argmin via window on (round-6 L2², codeword id);
    * final score sums the m per-subspace contributions through
    * DECIMAL(20,10) so partial-aggregation order can't perturb the float
    * result (contributions are pre-rounded to 6dp — identical doubles in
    * any engine).
    */
  def pqTopK(corpus: DataFrame, idCol: String, vecCol: String,
             queryVec: Seq[Double], k: Int, m: Int = 8,
             roundTo: Int = 6, codewordEvery: Long = 0L,
             corpusN: Long = 0L): DataFrame = {
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = TextOps.spread(corpus).select(col(idCol).as("vid"), vd.as("v"))
    val spacing = sqrtSpacing(corpus, codewordEvery, corpusN)
    pqAdcScores(e, e, spacing, queryVec, m, roundTo)
      .orderBy(col("score").desc, col("vid"))
      .limit(k)
      .select(col("vid").as(idCol), col("score"))
  }

  /** PQ asymmetric-distance scores of `members` (vid, v) against the
    * query: codebook = every `spacing`-th row of `codebookSrc` (vid, v),
    * sliced into `m` subspaces; each member's per-subspace nearest
    * codeword (round-6 L2, cid tie-break) indexes the precomputed
    * query·codeword table, and the ADC score is the DECIMAL-exact sum of
    * the m looked-up contributions. Shared verbatim by [[pqTopK]] (members
    * = whole corpus) and [[ivfPqTopK]] (members = probed-cell candidates
    * only), so composing IVF in front cannot drift the PQ arithmetic. */
  private def pqAdcScores(members: DataFrame, codebookSrc: DataFrame,
                          spacing: Long, queryVec: Seq[Double], m: Int,
                          roundTo: Int): DataFrame =
    pqAdcScoresCb(members,
      pqSpacedCodebook(codebookSrc, spacing, queryVec.length / m, m),
      queryVec, m, roundTo)

  /** The deterministic spaced PQ codebook: every `spacing`-th row of
    * `src` (vid, v), sliced into m d-dim subspace codewords (s, cid, cs).
    * Doubles as the Lloyd seed set for [[pqCodebookTrained]]. */
  private def pqSpacedCodebook(src: DataFrame, spacing: Long, d: Int,
                               m: Int): DataFrame =
    src.filter(col("vid") % spacing === 0)
      .select(col("vid").as("cid"), explode(sequence(lit(0), lit(m - 1))).as("s"), col("v"))
      .select(col("cid"), col("s"), slice(col("v"), col("s") * d + 1, lit(d)).as("cs"))

  /** Per-(vid, s) nearest-codeword assignment by round-6 L2², cid
    * tie-break — the shared quantization step of ADC scoring, Lloyd
    * training, and MSE measurement. Returns (vid, s, cid, d2). */
  private def pqAssign(sub: DataFrame, cb: DataFrame, roundTo: Int): DataFrame = {
    // r14-opt ×2, same result row-for-row:
    //  - the self-terms x·x and c·c are per-ROW quantities — compute them
    //    below the join (once per subvector / once per codeword) instead
    //    of per PAIR, so the n·k·m pair kernel runs ONE dot, not three
    //    (the CLAUDE.md oracle-perf rule, applied to the engine side);
    //    same left-to-right summation (xx − 2·x·c) + cc ⇒ identical d2.
    // (an arg-min min_by(struct…) aggregation was tried here — map-side
    // partial aggregation in place of the rank-1 window — but a struct
    // payload with an array field forces ObjectHashAggregate with its
    // 128-group sort fallback, and measured ~30% SLOWER than the window
    // at sf0.1; the window sort stays.)
    val wA = Window.partitionBy(col("vid"), col("s")).orderBy(col("d2"), col("cid"))
    sub.withColumn("xx", vec.dot(col("xs"), col("xs")))
      .join(broadcast(cb.withColumn("cc", vec.dot(col("cs"), col("cs")))), "s")
      .withColumn("d2", round(
        col("xx") - lit(2.0) * vec.dot(col("xs"), col("cs")) + col("cc"),
        roundTo))
      .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
      .select(col("vid"), col("s"), col("xs"), col("cid"), col("d2"))
  }

  /** (vid, s, xs) subvector rows of `members` (vid, v): m slices of d. */
  private def pqSub(members: DataFrame, d: Int, m: Int): DataFrame =
    members
      .select(col("vid"), explode(sequence(lit(0), lit(m - 1))).as("s"), col("v"))
      .select(col("vid"), col("s"), slice(col("v"), col("s") * d + 1, lit(d)).as("xs"))

  /** ADC scores of `members` against an EXPLICIT codebook (s, cid, cs) —
    * spaced ([[pqTopK]]) and trained ([[pqTopKWith]]) share this path. */
  private def pqAdcScoresCb(members: DataFrame, cb: DataFrame,
                            queryVec: Seq[Double], m: Int,
                            roundTo: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = queryVec.length / m
    val assigned = pqAssign(pqSub(members, d, m), cb, roundTo)
      .select(col("vid"), col("s"), col("cid"))
    val qv = typedlit(queryVec)
    val contrib = cb.select(col("s"), col("cid"),
      round(vec.dot(slice(qv, col("s") * d + 1, lit(d)), col("cs")), roundTo)
        .as("contrib"))
    assigned.join(broadcast(contrib), Seq("s", "cid"))
      .groupBy(col("vid"))
      .agg(round(sum(col("contrib").cast(DecimalType(20, 10))).cast("double"), roundTo)
        .as("score"))
  }

  /** The spaced PQ codebook in public form (the untrained baseline and
    * Lloyd seed set), for callers comparing quantizers. Returns
    * (s, cid, cs). */
  def pqCodebookSpaced(corpus: DataFrame, idCol: String, vecCol: String,
                       dim: Int, m: Int = 8,
                       codewordEvery: Long = 0L,
                       corpusN: Long = 0L): DataFrame = {
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = corpus.select(col(idCol).as("vid"), vd.as("v"))
    val spacing = sqrtSpacing(corpus, codewordEvery, corpusN)
    pqSpacedCodebook(e, spacing, dim / m, m)
  }

  /** Deterministic per-subspace Lloyd training of the PQ codebook — the
    * trained-quantizer step for the FINE quantizer, mirroring
    * [[kmeansCentroids]] for the coarse one: seeds are the ⌈√n⌉-spaced
    * codewords, each iteration assigns every (vid, s) subvector to its
    * round-6-L2² nearest codeword (cid tie-break) and recomputes
    * per-(s, cid, dim) means through DECIMAL(20,10) partial sums rounded
    * to `roundTo`. The subspace id rides along as a group key, so all m
    * subspace k-means runs execute as ONE set of joins/aggregations —
    * no per-subspace loop, no extra shuffles. Fixed iterations, no RNG:
    * bit-identical codebooks at any partitioning, oracle-replayable as
    * unrolled CTEs. Returns (s, cid, cs). */
  def pqCodebookTrained(corpus: DataFrame, idCol: String, vecCol: String,
                        dim: Int, m: Int = 8, iters: Int = 2,
                        roundTo: Int = 6,
                        codewordEvery: Long = 0L,
                        corpusN: Long = 0L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = dim / m
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = TextOps.spread(corpus).select(col(idCol).as("vid"), vd.as("v"))
    val spacing = sqrtSpacing(corpus, codewordEvery, corpusN)
    val sub = pqSub(e, d, m).localCheckpoint()
    var cb = pqSpacedCodebook(e, spacing, d, m)
    for (_ <- 1 to iters) {
      cb = pqAssign(sub, cb, roundTo)
        .select(col("s"), col("cid"), posexplode(col("xs")))
        .groupBy(col("s"), col("cid"), col("pos"))
        .agg(round(sum(col("col").cast(DecimalType(20, 10))).cast("double") /
          count(lit(1)), roundTo).as("m"))
        .groupBy(col("s"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cs"))
        .localCheckpoint()
    }
    cb
  }

  /** PQ ADC top-k against a CALLER-SUPPLIED codebook (s, cid, cs) —
    * the trained counterpart of [[pqTopK]], same query path. */
  def pqTopKWith(corpus: DataFrame, idCol: String, vecCol: String,
                 cb: DataFrame, queryVec: Seq[Double], k: Int, m: Int = 8,
                 roundTo: Int = 6): DataFrame = {
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = TextOps.spread(corpus).select(col(idCol).as("vid"), vd.as("v"))
    pqAdcScoresCb(e, cb, queryVec, m, roundTo)
      .orderBy(col("score").desc, col("vid"))
      .limit(k)
      .select(col("vid").as(idCol), col("score"))
  }

  /** Mean PQ quantization error (the number codebook training exists to
    * reduce): mean over every (vid, s) subvector of the round-6 L2² to
    * its assigned codeword, summed in DECIMAL so the mean is exact at any
    * parallelism. One row: (mse). */
  def pqMse(corpus: DataFrame, idCol: String, vecCol: String,
            cb: DataFrame, dim: Int, m: Int = 8,
            roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = dim / m
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = TextOps.spread(corpus).select(col(idCol).as("vid"), vd.as("v"))
    pqAssign(pqSub(e, d, m), cb, roundTo)
      .agg(round(sum(col("d2").cast(DecimalType(20, 10))).cast("double") /
        count(lit(1)), roundTo).as("mse"))
  }

  /** Variance-balanced dimension allocation — the coordinate-basis
    * specialization of OPQ's eigenvalue-allocation step (Ge et al.
    * CVPR'13, the OPQ_P "free" solution under a diagonal-covariance
    * assumption): the contiguous subspace split concentrates a
    * spectrum-ordered embedding's variance in the first subspaces, so
    * dims are ranked by round-6 per-dim variance (dim-index tie-break)
    * and dealt SNAKE-wise into the m subspaces (rank r → subspace r%m on
    * even passes, m−1−r%m on odd — the closed-form balanced deal, no
    * sequential greedy loop to replay). Variance moments run through
    * DECIMAL(20,10) partial sums, so the permutation — and every
    * downstream codebook — is bit-identical at any partitioning.
    *
    * Returns the corpus re-laid-out by the permutation under the SAME
    * column names, ready for [[pqCodebookTrained]]/[[pqMse]]. Scale
    * shape: one d-key moment aggregation + two ≤d-row windows to build
    * the permutation array, then a map-side broadcast re-layout — no
    * extra corpus shuffle. */
  def permuteBalanced(corpus: DataFrame, idCol: String, vecCol: String,
                      dim: Int, m: Int = 8, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = TextOps.spread(corpus).select(col(idCol), vd.as("__v"))
    val mom = e.select(posexplode(col("__v")))
      .select(col("pos").as("i"), col("col").as("xv"))
      .groupBy(col("i"))
      .agg((sum(col("xv").cast(DecimalType(20, 10))).cast("double") /
        count(lit(1))).as("m1"),
        // The square is floor-rounded to 8dp BEFORE the decimal cast
        // (q_text_jsd precedent): a raw double product can sit on a 10dp
        // half-boundary where Spark's HALF_UP and DuckDB's scaled-binary
        // cast disagree by 1 ulp — enough to flip a round-6 variance and
        // with it the whole permutation. An 8dp floor-rounded double is
        // never on a 10dp half-boundary, so the cast is engine-exact.
        (sum(graft.graph.NodeEmbedding.pround(col("xv") * col("xv"), 8)
          .cast(DecimalType(20, 10))).cast("double") /
          count(lit(1))).as("m2"))
    val ranked = mom
      .select(col("i"), graft.graph.NodeEmbedding.pround(
        col("m2") - col("m1") * col("m1"), roundTo).as("vr"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("vr").desc, col("i"))) - 1)
    val placed = ranked
      .withColumn("sub", when(pmod((col("r") / m).cast("int"), lit(2)) === 0,
        pmod(col("r"), lit(m))).otherwise(lit(m - 1) - pmod(col("r"), lit(m))))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("sub")).orderBy(col("i"))) - 1)
    val parr = placed
      .agg(transform(array_sort(collect_list(
        struct((col("sub") * (dim / m) + col("k")).as("np"), col("i")))),
        s => s.getField("i")).as("parr"))
    e.crossJoin(broadcast(parr))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          p => element_at(col("__v"), element_at(col("parr"), p + 1) + 1))
          .as(vecCol))
  }

  /** Two-level residual quantization parts (Chen et al. 2010 / the RQ
    * family production vector stores ship beside PQ): level-1 codebook =
    * every `spacing`-th corpus vector FULL-dim; each vector snaps to its
    * nearest codeword (round-6 L2², cid tie-break) and keeps the exact
    * element-wise residual; level-2 codebook = the residuals of the
    * OFFSET stratum vid ≡ 1 (mod spacing) — the ≡ 0 stratum's residuals
    * are ≈ 0 by construction and would make level 2 vacuous — PLUS the
    * zero codeword (cid2 = −1, preferred on distance ties): "no
    * correction" is always available, so the level-2 error is ≤ the
    * level-1 error POINTWISE, not merely on average (without it a small
    * residual gets pushed AWAY by the nearest nonzero codeword —
    * measured +29% MSE on the sf0.01 fixture before the fix). Returns
    * (cb1 (cid1, c1), cb2 (cid2, c2), assigned (vid, cid1, cid2, d2,
    * d2r)) where d2/d2r are the level-1/level-2 squared quantization
    * errors. Shape at scale: two broadcast-codebook joins with
    * (vid)-keyed argmin windows — n·√n distance rows per level, no
    * all-pairs; the residual subtract is one zip_with on the already-
    * joined row. */
  private[graft] def rqParts(corpus: DataFrame, idCol: String, vecCol: String,
                             roundTo: Int = 6, codewordEvery: Long = 0L,
                             corpusN: Long = 0L)
      : (DataFrame, DataFrame, DataFrame) = {
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = TextOps.spread(corpus).select(col(idCol).as("vid"), vd.as("v"))
    val spacing = sqrtSpacing(corpus, codewordEvery, corpusN)
    val cb1 = e.filter(col("vid") % spacing === 0)
      .select(col("vid").as("cid1"), col("v").as("c1"))
    // r14-opt: self-terms (v·v, c·c, r·r) hoisted below the pair joins —
    // once per row/codeword instead of per pair, identical summation
    // order ⇒ identical d2/d2r (the pqAssign discipline; full-dim RQ
    // vectors make the per-pair waste 3× of a 64-wide dot)
    val w1 = Window.partitionBy(col("vid")).orderBy(col("d2"), col("cid1"))
    val a1 = e.withColumn("vv", vec.dot(col("v"), col("v")))
      .crossJoin(broadcast(cb1.withColumn("c11", vec.dot(col("c1"), col("c1")))))
      .withColumn("d2", round(
        col("vv") - lit(2.0) * vec.dot(col("v"), col("c1")) + col("c11"),
        roundTo))
      .withColumn("rn", row_number().over(w1)).filter(col("rn") === 1)
      .select(col("vid"), col("cid1"), col("d2"),
        zip_with(col("v"), col("c1"), (a, b) => a - b).as("r"))
      .withColumn("rr", vec.dot(col("r"), col("r")))
      .localCheckpoint()
    val zero = e.orderBy(col("vid")).limit(1)
      .select(lit(-1L).as("cid2"),
        transform(col("v"), _ => lit(0.0)).as("c2"))
    val cb2 = a1.filter(col("vid") % spacing === 1)
      .select(col("vid").as("cid2"), col("r").as("c2"))
      .unionByName(zero)
    val w2 = Window.partitionBy(col("vid")).orderBy(col("d2r"), col("cid2"))
    val a2 = a1.crossJoin(broadcast(cb2.withColumn("c22", vec.dot(col("c2"), col("c2")))))
      .withColumn("d2r", round(
        col("rr") - lit(2.0) * vec.dot(col("r"), col("c2")) + col("c22"),
        roundTo))
      .withColumn("rn", row_number().over(w2)).filter(col("rn") === 1)
      .select(col("vid"), col("cid1"), col("cid2"), col("d2"), col("d2r"))
    (cb1, cb2, a2)
  }

  /** RQ asymmetric top-k: score = q·(c1 + c2) = the sum of two
    * codebook-table lookups (round-6 each, DECIMAL-added) — the
    * 2·√n-entry lookup table replaces any corpus-width dot product at
    * query time, the same serving economics as PQ's ADC but with
    * full-dim codewords whose second level corrects the first's error.
    * Returns (idCol, score) ordered by score desc, id. */
  def rqTopK(corpus: DataFrame, idCol: String, vecCol: String,
             queryVec: Seq[Double], k: Int, roundTo: Int = 6,
             codewordEvery: Long = 0L, corpusN: Long = 0L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val (cb1, cb2, a2) = rqParts(corpus, idCol, vecCol, roundTo,
      codewordEvery, corpusN)
    val qv = typedlit(queryVec)
    val t1 = cb1.select(col("cid1"), round(vec.dot(qv, col("c1")), roundTo).as("t1"))
    val t2 = cb2.select(col("cid2"), round(vec.dot(qv, col("c2")), roundTo).as("t2"))
    a2.join(broadcast(t1), "cid1").join(broadcast(t2), "cid2")
      .select(col("vid"),
        round((col("t1").cast(DecimalType(20, 10)) +
          col("t2").cast(DecimalType(20, 10))).cast("double"), roundTo)
          .as("score"))
      .orderBy(col("score").desc, col("vid"))
      .limit(k)
      .select(col("vid").as(idCol), col("score"))
  }

  /** Per-level mean squared quantization error of the RQ code — the
    * falsifiable claim behind residual quantization (level 2 corrects
    * level 1). Returns (level, mse) rows, DECIMAL-exact averages. */
  def rqMse(corpus: DataFrame, idCol: String, vecCol: String,
            roundTo: Int = 6, codewordEvery: Long = 0L,
            corpusN: Long = 0L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val (_, _, a2) = rqParts(corpus, idCol, vecCol, roundTo,
      codewordEvery, corpusN)
    // r14-opt: both levels' MSEs from ONE aggregation pass — the old
    // m1 ∪ m2 pair of aggregates re-executed a2's level-2 assignment
    // (cross join + rank window) twice for two numbers computed from
    // the same rows. Same sums, same rounding ⇒ identical output.
    a2.agg(
        round(sum(col("d2").cast(DecimalType(20, 10)))
          .cast("double") / count(lit(1)), roundTo).as("mse1"),
        round(sum(col("d2r").cast(DecimalType(20, 10)))
          .cast("double") / count(lit(1)), roundTo).as("mse2"))
      .select(explode(array(
        struct(lit(1).as("level"), col("mse1").as("mse")),
        struct(lit(2).as("level"), col("mse2").as("mse")))).as("r"))
      .select(col("r.level").as("level"), col("r.mse").as("mse"))
      .orderBy(col("level"))
  }

  /** IVF→PQ→exact-rerank — the production ANN serving composition
    * (FAISS's IVFPQ shape re-expressed as one Catalyst plan): the trained
    * coarse quantizer prunes the corpus to `nprobe` cells' members, PQ
    * asymmetric-distance ranks ONLY those candidates from m compact
    * subspace codes, and the top `rerank` by ADC score are re-scored with
    * the true round-6 cosine for the final top-k. Memory/IO story at
    * scale: the full vectors are touched for assignment and the `rerank`
    * finalists; everything between runs on √n-spaced codebook lookups.
    * The candidate set (≈ nprobe·√n rows with the ⌈√n⌉ codebook) bounds
    * the global ADC rank window — never the corpus. Returns
    * (idCol, pq_score, score) ordered by exact score. */
  def ivfPqTopK(corpus: DataFrame, idCol: String, vecCol: String,
                cent: DataFrame, queryVec: Seq[Double], k: Int, m: Int = 8,
                nprobe: Int = 2, rerank: Int = 30, roundTo: Int = 6,
                codewordEvery: Long = 0L, corpusN: Long = 0L): DataFrame = {
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = TextOps.spread(corpus).select(col(idCol).as("vid"), vd.as("v"))
    val spacing = sqrtSpacing(corpus, codewordEvery, corpusN)
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = e.join(broadcast(cent))
      .withColumn("ccos", round(vec.cosine(col("v"), col("cv")), roundTo))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vid"), col("v"), col("cid"))
    val qv = typedlit(queryVec)
    val probed = cent
      .withColumn("qcos", round(vec.cosine(col("cv"), qv), roundTo))
      .orderBy(col("qcos").desc, col("cid")).limit(nprobe)
      .select(col("cid"))
    val cand = assigned.join(broadcast(probed), "cid")
      .select(col("vid"), col("v"))
    // ADC rank as orderBy+limit → TakeOrderedAndProject (per-partition
    // heaps), NOT a single-partition row_number window: identical rows
    // under the same (score desc, vid) total order, but the plan stays
    // parallel when the probed candidate set is 10⁶ rows instead of 10³.
    pqAdcScores(cand, e, spacing, queryVec, m, roundTo)
      .orderBy(col("score").desc, col("vid"))
      .limit(rerank)
      .select(col("vid"), col("score").as("pq_score"))
      .join(cand, "vid")
      .withColumn("score", round(vec.cosine(col("v"), qv), roundTo))
      .orderBy(col("score").desc, col("vid")).limit(k)
      .select(col("vid").as(idCol), col("pq_score"), col("score"))
  }

  /** Binary sign-sketch Hamming ranking: each vector compresses to TWO
    * 32-bit sign codes (bit = component > 0, MSB-first fold — 8 bytes
    * per vector instead of 8·dim), candidates rank by Hamming distance
    * to the query's code (one xor + popcount per half), and the exact
    * round-6 cosine is carried for the finalists. The memory-bandwidth
    * sketch (Charikar sign-LSH in packed form): at 100 TB the scan reads
    * two BIGINT columns, not the float arrays, and the code build is one
    * map-side fold per row — no shuffle before the bounded top-k. Two
    * 32-bit halves (not one 64-bit code) so the integer fold can never
    * overflow a signed BIGINT in either engine. Ties (equal Hamming)
    * break by id; `k` bounds the TakeOrdered. */
  def hammingTopK(corpus: DataFrame, idCol: String, vecCol: String,
                  queryVec: Seq[Double], k: Int, roundTo: Int = 6): DataFrame = {
    // two equal halves, each folded into a*2+bit — an odd dimension would
    // silently truncate the last component and halves past 63 bits would
    // overflow the signed BIGINT fold; misuse must fail fast, not drift
    require(queryVec.length % 2 == 0 && queryVec.length <= 126,
      s"hammingTopK needs an even dimension <= 126, got ${queryVec.length}")
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    def codeOf(half: Column): Column =
      aggregate(half, lit(0L),
        (a, x) => a * 2 + when(x > 0, lit(1L)).otherwise(lit(0L)))
    def qCode(xs: Seq[Double]): Long =
      xs.foldLeft(0L)((a, x) => a * 2 + (if (x > 0) 1L else 0L))
    val half = queryVec.length / 2
    val (q1, q2) = (qCode(queryVec.take(half)), qCode(queryVec.drop(half)))
    val qv = typedlit(queryVec)
    TextOps.spread(corpus).select(col(idCol).as("vid"), vd.as("v"))
      .withColumn("h1", codeOf(slice(col("v"), 1, half)))
      .withColumn("h2", codeOf(slice(col("v"), half + 1, half)))
      .withColumn("hamming",
        (bit_count(col("h1").bitwiseXOR(lit(q1))) +
          bit_count(col("h2").bitwiseXOR(lit(q2)))).cast("int"))
      .withColumn("cos", round(vec.cosine(col("v"), qv), roundTo))
      .orderBy(col("hamming").asc, col("vid"))
      .limit(k)
      .select(col("vid").as(idCol), col("hamming"), col("cos"))
  }

  /** Packed-Hamming ANN for a BATCH of query vectors — [[hammingTopK]] in
    * the multi-tenant serving shape of [[ivfTopKQueries]]: corpus sign
    * codes are built ONCE (one map-side fold pass over the scan — the
    * 8-bytes-per-vector form), query codes ride a broadcast, ranking is a
    * popcount per (query, vector) over the packed codes, and the exact
    * round-`roundTo` cosine is computed ONLY for the ≤ batch·k finalists
    * — the full float arrays never cross the ranking join, which is the
    * whole point of the sketch at 100 TB (the single-query path computes
    * cos pre-limit; here that would be batch·n cosines for nothing).
    * Per-query top-k via a window PARTITIONED BY qid. Single-query output
    * is row-identical to [[hammingTopK]] (spec-pinned).
    * Returns (qid, cand, hamming, cos, rn ≤ k). */
  def hammingTopKQueries(corpus: DataFrame, idCol: String, vecCol: String,
                         queries: DataFrame, qIdCol: String, qVecCol: String,
                         dim: Int, k: Int, roundTo: Int = 6): DataFrame = {
    require(dim % 2 == 0 && dim <= 126,
      s"hammingTopKQueries needs an even dimension <= 126, got $dim")
    val dt = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    def codeOf(half: Column): Column =
      aggregate(half, lit(0L),
        (a, x) => a * 2 + when(x > 0, lit(1L)).otherwise(lit(0L)))
    val half = dim / 2
    val coded = TextOps.spread(corpus)
      .select(col(idCol).as("vid"), col(vecCol).cast(dt).as("v"))
      .withColumn("h1", codeOf(slice(col("v"), 1, half)))
      .withColumn("h2", codeOf(slice(col("v"), half + 1, half)))
    val q = queries
      .select(col(qIdCol).as("qid"), col(qVecCol).cast(dt).as("qv"))
      .withColumn("qh1", codeOf(slice(col("qv"), 1, half)))
      .withColumn("qh2", codeOf(slice(col("qv"), half + 1, half)))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("hamming").asc, col("vid"))
    coded.join(broadcast(q))
      .withColumn("hamming",
        (bit_count(col("h1").bitwiseXOR(col("qh1"))) +
          bit_count(col("h2").bitwiseXOR(col("qh2")))).cast("int"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .withColumn("cos", round(vec.cosine(col("v"), col("qv")), roundTo))
      .select(col("qid"), col("vid").as("cand"), col("hamming"),
        col("cos"), col("rn"))
  }

  /** Int8 scalar-quantized (SQ8) ANN scan: one global symmetric scale
    * M = max |component| over the corpus (a single tiny aggregate — a
    * statistics lookup at lake scale, broadcast to every task) quantizes
    * each component to q = ⌊x·127/M⌋ ∈ [−127, 127]; candidates rank on
    * the ALL-INTEGER quantized dot product (every term ≤ dim·127², exact
    * in doubles — no summation-order sensitivity, so the ranking is
    * bit-identical at any parallelism), and the exact double cosine runs
    * only on the `rerank` finalists picked by orderBy+limit
    * (TakeOrderedAndProject — per-partition heaps, never a global sort).
    * This is the classic SQ8 serving path: int8 codes are a 4× I/O cut
    * vs float32 and the scan kernel is a cheap integer MAC; materialize
    * the `q` column once at ingest and the rerank step is the only
    * consumer that ever touches the full vectors.
    * Returns top-k (id, qdot, cos) by exact-cosine rank. */
  def sq8TopK(corpus: DataFrame, idCol: String, vecCol: String,
              queryVec: Seq[Double], k: Int, rerank: Int,
              roundTo: Int = 6): DataFrame =
    sq8TopKImpl(corpus, idCol, vecCol, queryVec, k, rerank, roundTo,
      scaleLit = None)

  /** [[sq8TopK]] against a PRE-TRAINED scale — the serving form: the
    * one SQ8 "parameter" (global max-|x|) is computed once per
    * embeddings snapshot and cached/persisted (AnnArtifacts, the
    * Engine's version-keyed cache), so a query does NOT pay a full
    * corpus agg to recover a number that only changes on write. Same
    * kernel; with scale == the snapshot's true max-|x| the output is
    * row-identical to [[sq8TopK]] (spec-pinned). */
  def sq8TopKWithScale(corpus: DataFrame, idCol: String, vecCol: String,
                       scale: Double, queryVec: Seq[Double], k: Int,
                       rerank: Int, roundTo: Int = 6): DataFrame =
    sq8TopKImpl(corpus, idCol, vecCol, queryVec, k, rerank, roundTo,
      scaleLit = Some(scale))

  private def sq8TopKImpl(corpus: DataFrame, idCol: String, vecCol: String,
                          queryVec: Seq[Double], k: Int, rerank: Int,
                          roundTo: Int, scaleLit: Option[Double]): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val dt = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val e0 = TextOps.spread(corpus)
      .select(col(idCol).as("vid"), col(vecCol).cast(dt).as("v"))
    val e = scaleLit match {
      case Some(sc) => e0.withColumn("mx", lit(sc))
      case None =>
        e0.join(broadcast(e0.agg(
          max(array_max(transform(col("v"), x => abs(x)))).as("mx"))))
    }
    val qv = typedlit(queryVec)
    e.withColumn("qq", transform(qv, x => floor(x * 127.0 / col("mx"))))
      .withColumn("qc", transform(col("v"), x => floor(x * 127.0 / col("mx"))))
      .withColumn("qdot", vec.dot(col("qc"), col("qq")).cast("long"))
      .orderBy(col("qdot").desc, col("vid"))
      .limit(rerank)
      .withColumn("cos", round(vec.cosine(col("v"), qv), roundTo))
      .orderBy(col("cos").desc, col("vid"))
      .limit(k)
      .select(col("vid").as(idCol), col("qdot"), col("cos"))
  }

  /** SQ8 ANN for a BATCH of query vectors — [[sq8TopK]] in the
    * multi-tenant serving shape of [[hammingTopKQueries]]: the corpus is
    * quantized ONCE per batch against the one global scale (per-query
    * literal plans re-pay the coding pass every call), quantized query
    * codes ride the broadcast, ranking is the exact integer dot per
    * (query, vector), and the true cosine runs only on the ≤ batch·rerank
    * finalists picked by a window PARTITIONED BY qid. Queries are
    * quantized with the CORPUS scale, exactly like the single-query path,
    * so per-query output is row-identical to [[sq8TopK]] (spec-pinned).
    * Returns (qid, cand, qdot, cos, rn ≤ k) by exact-cosine rank. */
  def sq8TopKQueries(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     k: Int, rerank: Int, roundTo: Int = 6): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val dt = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val e = TextOps.spread(corpus)
      .select(col(idCol).as("vid"), col(vecCol).cast(dt).as("v"))
    val scale = e.agg(
      max(array_max(transform(col("v"), x => abs(x)))).as("mx"))
    val coded = e.join(broadcast(scale))
      .withColumn("qc", transform(col("v"), x => floor(x * 127.0 / col("mx"))))
    val q = queries
      .select(col(qIdCol).as("qid"), col(qVecCol).cast(dt).as("qv"))
      .join(broadcast(scale))
      .withColumn("qq", transform(col("qv"), x => floor(x * 127.0 / col("mx"))))
      .select(col("qid"), col("qv"), col("qq"))
    val byDot = Window.partitionBy(col("qid"))
      .orderBy(col("qdot").desc, col("vid"))
    val byCos = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vid"))
    coded.join(broadcast(q))
      .withColumn("qdot", vec.dot(col("qc"), col("qq")).cast("long"))
      .withColumn("rf", row_number().over(byDot))
      .filter(col("rf") <= rerank)
      .withColumn("cos", round(vec.cosine(col("v"), col("qv")), roundTo))
      .withColumn("rn", row_number().over(byCos))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vid").as("cand"), col("qdot"),
        col("cos"), col("rn"))
  }

  /** PQ-flat ADC scoring for a BATCH of query vectors — [[pqTopK]] in the
    * serving shape: the corpus is PQ-coded ONCE for the whole batch (the
    * assignment pass is query-independent — per-query literal plans
    * re-pay it every call), the per-(qid, subspace, codeword) ADC lookup
    * table is built from the broadcast query batch, and per-query top-k
    * runs as a window PARTITIONED BY qid over the DECIMAL-exact summed
    * scores. The ADC table is |queries|·m·|codebook| rows and is
    * broadcast-GATED exactly like [[ivfPqTopKQueries]]: past
    * `broadcastRowLimit` estimated rows it falls back to a shuffle join
    * on (qid, s, cid), so batch size degrades throughput, never
    * stability. Pass corpusN/queriesN to keep the estimate job-free.
    * Single-query output is row-identical to [[pqTopK]] (spec-pinned).
    * Returns (qid, cand, score, rn ≤ k). */
  def pqTopKQueries(corpus: DataFrame, idCol: String, vecCol: String,
                    queries: DataFrame, qIdCol: String, qVecCol: String,
                    dim: Int, k: Int, m: Int = 8, roundTo: Int = 6,
                    codewordEvery: Long = 0L, corpusN: Long = 0L,
                    queriesN: Long = 0L,
                    broadcastRowLimit: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dt = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val e = TextOps.spread(corpus)
      .select(col(idCol).as("vid"), col(vecCol).cast(dt).as("v"))
    val n = if (corpusN > 0) corpusN else corpus.count()
    val spacing = sqrtSpacing(corpus, codewordEvery, n)
    val d = dim / m
    val cb = pqSpacedCodebook(e, spacing, d, m)
    val codes = pqAssign(pqSub(e, d, m), cb, roundTo)
      .select(col("vid"), col("s"), col("cid"))
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).cast(dt).as("qv"))
    val qN = if (queriesN > 0) queriesN else q.count()
    val contribRows = qN * (n / spacing + 1) * m
    val contrib = q.crossJoin(cb)
      .select(col("qid"), col("s"), col("cid"),
        round(vec.dot(slice(col("qv"), col("s") * d + 1, lit(d)), col("cs")),
          roundTo).as("contrib"))
    val gatedContrib =
      if (contribRows <= broadcastRowLimit) broadcast(contrib) else contrib
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vid"))
    codes.join(gatedContrib, Seq("s", "cid"))
      .groupBy(col("qid"), col("vid"))
      .agg(round(sum(col("contrib").cast(DecimalType(20, 10))).cast("double"),
        roundTo).as("score"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vid").as("cand"), col("score"), col("rn"))
  }

  /** IVF-flat ANN: the inverted-file index re-expressed as DataFrames.
    *
    * Coarse quantizer = every `centroidEvery`-th corpus vector (deterministic
    * — no k-means RNG; swap in trained centroids at production scale without
    * touching the query path). Build: assign each vector to its nearest
    * centroid (broadcast centroids × corpus scan, one narrow pass). Query:
    * rank centroids against the query, probe the `nprobe` nearest cells,
    * exact-rank only their members — scan work drops by ≈ nCentroids/nprobe
    * while the assignment table partitions by cell id, so at 100 TB each
    * probe touches only the probed cells' partitions.
    *
    * All ranking uses round-6 cosine with id tie-breaks (SURVEY §7.5.3).
    *
    * `centroidEvery` ≤ 0 derives the spacing as ⌈√n⌉, giving ≈√n
    * centroids: assignment cost n·√n instead of the n²/spacing blow-up a
    * FIXED spacing causes as the corpus grows (measured: 8.6× bench time
    * at 10× rows before this rule). At true cluster scale swap in trained
    * k-means centroids; the √n count is the standard IVF sizing either way.
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queryVec: Seq[Double], k: Int, centroidEvery: Int = 0,
              nprobe: Int = 2, roundTo: Int = 6,
              corpusN: Long = 0L): DataFrame = {
    val spacing = sqrtSpacing(corpus, centroidEvery.toLong, corpusN)
    val cent = corpus.filter(col(idCol) % spacing === 0)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    ivfTopKWith(corpus, idCol, vecCol, cent, queryVec, k, nprobe, roundTo)
  }

  /** Filter-aware ANN serving — the pre-filter vs post-filter decision
    * every production vector store makes when a search carries a metadata
    * predicate:
    *  - SELECTIVE predicate (filtered fraction ≤ `selectThreshold`):
    *    pre-filter — exact brute-force top-k over the filtered subset; a
    *    selective scan beats any index probe and the answer is exact
    *    (post-filtering an ANN index here would also starve: most probed
    *    candidates fail the predicate, recall collapses);
    *  - LOOSE predicate: post-filter — IVF probe over the FULL corpus
    *    with an `overFetch`× candidate budget, predicate applied to the
    *    candidates, top-k of survivors (pre-filtering here would scan
    *    nearly everything and waste the index).
    * The decision statistic is one count aggregate over the predicate —
    * at cluster scale that is a catalog/statistics lookup, not a data
    * pass. Returns (idCol, score) either way, so callers are
    * strategy-agnostic. */
  def filteredTopKAuto(corpus: DataFrame, idCol: String, vecCol: String,
                       pred: org.apache.spark.sql.Column, queryVec: Seq[Double],
                       k: Int, selectThreshold: Double = 0.2, overFetch: Int = 4,
                       centroidEvery: Int = 0, nprobe: Int = 2,
                       roundTo: Int = 6, corpusN: Long = 0L): DataFrame = {
    val n = if (corpusN > 0) corpusN else corpus.count()
    val filtered = corpus.filter(pred)
    val m = filtered.count()
    if (n == 0 || m <= selectThreshold * n) {
      graft.search.VectorSearch.topK(filtered, idCol, vecCol, queryVec, k,
          scoreCol = "score", cosine = true, roundTo = Some(roundTo))
        .select(col(idCol), col("score"))
    } else {
      val cand = ivfTopK(corpus, idCol, vecCol, queryVec, k * overFetch,
        centroidEvery, nprobe, roundTo, corpusN = n)
      cand.join(filtered.select(col(idCol)), Seq(idCol), "left_semi")
        .orderBy(col("score").desc, col(idCol))
        .limit(k)
    }
  }

  /** IVF query path against a CALLER-SUPPLIED coarse quantizer (cid, cv) —
    * the spaced sample ([[ivfTopK]]) and trained k-means centroids
    * ([[kmeansCentroids]]) share this code, so swapping quantizers never
    * touches the query semantics: assign every vector to its arg-max-cosine
    * centroid (broadcast join + vid window), probe the `nprobe` cells
    * nearest the query, exact-rank only their members. */
  def ivfTopKWith(corpus: DataFrame, idCol: String, vecCol: String,
                  cent: DataFrame, queryVec: Seq[Double], k: Int,
                  nprobe: Int = 2, roundTo: Int = 6): DataFrame = {
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = TextOps.spread(corpus)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .join(broadcast(cent))
      .withColumn("ccos", round(vec.cosine(col("v"), col("cv")), roundTo))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vid"), col("v"), col("cid"))
    val qv = typedlit(queryVec)
    val probed = cent
      .withColumn("qcos", round(vec.cosine(col("cv"), qv), roundTo))
      .orderBy(col("qcos").desc, col("cid")).limit(nprobe)
      .select(col("cid"))
    assigned.join(broadcast(probed), "cid")
      .withColumn("score", round(vec.cosine(col("v"), qv), roundTo))
      .orderBy(col("score").desc, col("vid")).limit(k)
      .select(col("vid").as(idCol), col("score"))
  }

  /** IVF query path for a BATCH of query vectors (the multi-tenant serving
    * shape): same assignment as [[ivfTopKWith]], per-query probe ranking
    * over the broadcast centroid table, then exact rank of probed-cell
    * members only. Queries and centroids are both small (broadcast); the
    * corpus-side work is one assignment pass + one probed-cell equi-join.
    * Returns (qid, cand, score, rn ≤ k). */
  def ivfTopKQueries(corpus: DataFrame, idCol: String, vecCol: String,
                     cent: DataFrame, queries: DataFrame, qIdCol: String,
                     qVecCol: String, k: Int, nprobe: Int = 2,
                     roundTo: Int = 6): DataFrame = {
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = TextOps.spread(corpus)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .join(broadcast(cent))
      .withColumn("ccos", round(vec.cosine(col("v"), col("cv")), roundTo))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vid"), col("v"), col("cid"))
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("qcos", round(vec.cosine(col("qv"), col("cv")), roundTo))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vid"))
    assigned.join(broadcast(probes), "cid")
      .withColumn("score", round(vec.cosine(col("v"), col("qv")), roundTo))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vid").as("cand"), col("score"), col("rn"))
  }

  /** IVF→PQ→exact-rerank for a BATCH of query vectors — [[ivfPqTopK]]'s
    * serving composition in the multi-tenant shape of [[ivfTopKQueries]]:
    * ONE corpus assignment pass and ONE candidate PQ-coding pass are
    * shared by every query in the batch; per-query work is the broadcast
    * probe ranking, the m table lookups per candidate, and bounded
    * rerank/top-k windows PARTITIONED BY qid — never a global window, and
    * never a per-query replan. This is the amortization a per-query
    * literal plan ([[ivfPqTopK]]) structurally cannot give a production
    * serving batch: at 100 TB the assignment pass dominates, and here its
    * cost is paid once for the whole batch. Single-query output is
    * row-identical to [[ivfPqTopK]] (spec-pinned): the PQ arithmetic is
    * the same spaced codebook, round-6 ADC decimal sum, and (score desc,
    * vid) orders.
    *
    * Broadcast bound: the per-(qid, subspace, codeword) ADC table is
    * |queries|·m·|codebook| rows — with the default ⌈√n⌉ codebook that is
    * batch·m·√n, which outgrows executor broadcast memory for the large
    * batches this plan otherwise serves well. The broadcast is therefore
    * GATED: when the estimated ADC-table (or probe-table) row count
    * exceeds `broadcastRowLimit`, the plan falls back to a shuffle join
    * on (qid, s, cid) / (cid) — same rows, AQE picks the exchange — so
    * batch size degrades throughput, never correctness or stability.
    * Pass `queriesN` (like `corpusN`) to keep the estimate job-free.
    * Returns (qid, cand, pq_score, score, rn ≤ k) ordered by exact score
    * per query. */
  def ivfPqTopKQueries(corpus: DataFrame, idCol: String, vecCol: String,
                       cent: DataFrame, queries: DataFrame, qIdCol: String,
                       qVecCol: String, dim: Int, k: Int, m: Int = 8,
                       nprobe: Int = 2, rerank: Int = 30, roundTo: Int = 6,
                       codewordEvery: Long = 0L, corpusN: Long = 0L,
                       queriesN: Long = 0L,
                       broadcastRowLimit: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dt = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val e = TextOps.spread(corpus)
      .select(col(idCol).as("vid"), col(vecCol).cast(dt).as("v"))
    val n = if (corpusN > 0) corpusN else corpus.count()
    val spacing = sqrtSpacing(corpus, codewordEvery, n)
    val d = dim / m
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = e.join(broadcast(cent))
      .withColumn("ccos", round(vec.cosine(col("v"), col("cv")), roundTo))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vid"), col("v"), col("cid"))
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).cast(dt).as("qv"))
    // size estimates for the broadcast gate — job-free when the caller
    // supplies corpusN/queriesN (declared queries pass the Tables memo)
    val qN = if (queriesN > 0) queriesN else q.count()
    val cbRows = (n / spacing + 1) * m
    val probeRows = qN * nprobe
    val contribRows = qN * cbRows
    def gated(df: DataFrame, rows: Long): DataFrame =
      if (rows <= broadcastRowLimit) broadcast(df) else df
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("qcos", round(vec.cosine(col("qv"), col("cv")), roundTo))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    val cand = assigned.join(gated(probes, probeRows), "cid")
      .select(col("qid"), col("qv"), col("vid"), col("v"))
    // PQ codes once per DISTINCT candidate vid — query-independent, so a
    // vector probed by many queries is coded exactly once
    val candVec = cand.select(col("vid"), col("v")).dropDuplicates("vid")
    val cb = pqSpacedCodebook(e, spacing, d, m)
    val codes = pqAssign(pqSub(candVec, d, m), cb, roundTo)
      .select(col("vid"), col("s"), col("cid"))
    // per-(qid, subspace, codeword) lookup table: |queries|·m·|codebook|
    // rows, broadcast — the ADC table in batch form
    val contrib = q.crossJoin(cb)
      .select(col("qid"), col("s"), col("cid"),
        round(vec.dot(slice(col("qv"), col("s") * d + 1, lit(d)), col("cs")),
          roundTo).as("contrib"))
    val adc = cand.select(col("qid"), col("vid"))
      .join(codes, "vid")
      .join(gated(contrib, contribRows), Seq("qid", "s", "cid"))
      .groupBy(col("qid"), col("vid"))
      .agg(round(sum(col("contrib").cast(DecimalType(20, 10))).cast("double"),
        roundTo).as("pq_score"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("pq_score").desc, col("vid"))
    val finalists = adc.withColumn("prn", row_number().over(wAdc))
      .filter(col("prn") <= rerank)
      .select(col("qid"), col("vid"), col("pq_score"))
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vid"))
    finalists.join(cand, Seq("qid", "vid"))
      .withColumn("score", round(vec.cosine(col("v"), col("qv")), roundTo))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vid").as("cand"), col("pq_score"),
        col("score"), col("rn"))
  }

  /** Durable quantizer artifacts — the vector-side counterpart of
    * [[graft.search.Bm25Index.save]]/load: a production ANN stack trains
    * the coarse quantizer / PQ codebook ONCE, persists it, and every
    * serving job reopens the parquet (partition-prunable, schema-checked)
    * instead of retraining. Training is bit-deterministic here (no-RNG
    * Lloyd), so save → load → serve is spec-proven ROW-IDENTICAL to
    * serving from the in-memory artifact — the property that makes the
    * persisted index a cache rather than an approximation. Centroids are
    * (cid, cv: array<double>); PQ codebooks (cid, s, cs: array<double>)
    * — both written as-is, loaded with a column check that fails fast on
    * a path mixup instead of mis-serving. */
  def saveQuantizer(artifact: DataFrame, path: String): Unit =
    artifact.write.mode("overwrite").parquet(path)

  def loadQuantizer(spark: org.apache.spark.sql.SparkSession, path: String,
                    expectCols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    require(expectCols.forall(df.columns.contains),
      s"quantizer at $path has ${df.columns.mkString(",")}, " +
        s"expected ${expectCols.mkString(",")}")
    df
  }

  /** Cluster-stratified representative selection: for each cell of a
    * caller-supplied quantizer (cid, cv) — typically [[kmeansCentroids]] —
    * the `perCell` members nearest their own centroid, by round-6 cosine
    * with vid tie-breaks. The coverage-preserving subset selection
    * (coreset / diversity sampling) curation pipelines use where uniform
    * sampling over-draws dense regions: every region of embedding space
    * contributes, regardless of density.
    *
    * Scale shape: one broadcast-centroid assignment join (the IVF-build
    * pass, linear in corpus size) + one cid-partitioned window — no
    * global window, no pairwise distances. Returns
    * (cid, idCol, ccos, rn ≤ perCell) ordered by (cid, rn). */
  def cellRepresentatives(corpus: DataFrame, idCol: String, vecCol: String,
                          cent: DataFrame, perCell: Int = 2,
                          roundTo: Int = 6): DataFrame = {
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = TextOps.spread(corpus)
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .join(broadcast(cent))
      .withColumn("ccos", round(vec.cosine(col("v"), col("cv")), roundTo))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("cid"), col("vid"), col("ccos"))
    val wRep = Window.partitionBy(col("cid"))
      .orderBy(col("ccos").desc, col("vid"))
    assigned.withColumn("rn", row_number().over(wRep))
      .filter(col("rn") <= perCell)
      .select(col("cid"), col("vid").as(idCol), col("ccos"), col("rn"))
      .orderBy(col("cid"), col("rn"))
  }

  /** Top principal component of the mean-centered embedding corpus via
    * deterministic power iteration — the embedding-space analysis step
    * (dominant-direction / anisotropy diagnostics, whitening input) that
    * sits beside [[kmeansCentroids]] in a curation pipeline.
    *
    * Everything is DataFrame algebra with the same no-RNG float discipline
    * that makes k-means oracle-replayable:
    *   - per-dimension mean through DECIMAL(20,10) partial sums, round-6;
    *   - covariance C = Σ c·cᵀ / n via a vid-keyed self-join of the
    *     centered exploded values (n·d² product rows — LINEAR in corpus
    *     size, co-partitioned by vid, never all-pairs across rows) with
    *     DECIMAL(20,12) partial sums, round-6 — d² small values,
    *     localCheckpointed once and reused by every iteration;
    *   - power step u = C·w as a join against the BROADCAST d-row w with
    *     a decimal-exact dot product, normalize by the double sqrt of a
    *     decimal-exact Σu², round-6; iteration count FIXED (all-ones
    *     start, so the sign is pinned too).
    * Same input ⇒ bit-identical loadings at any partitioning, so the
    * DuckDB oracle replays the iterations as unrolled CTEs.
    *
    * Returns (idx: int, loading: double, lambda: double) — the unit
    * principal direction and its Rayleigh eigenvalue estimate ‖C·w‖. */
  def pcaTopComponent(emb: DataFrame, idCol: String, vecCol: String,
                      iters: Int = 3, roundTo: Int = 6): DataFrame = {
    val (_, cov, w) = pcaParts(emb, idCol, vecCol, iters, roundTo)
    pcaTopComponentWith(cov, w, roundTo)
  }

  /** [[pcaTopComponent]] against CALLER-SUPPLIED pcaParts output — lets a
    * session train the PCA once and serve every consumer from the shared
    * (x, cov, w) artifact, the same once-per-session discipline as the
    * trained IVF/PQ codebooks. */
  def pcaTopComponentWith(cov: DataFrame, w: DataFrame,
                          roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def mul(w: DataFrame): DataFrame =
      cov.join(broadcast(w.withColumnRenamed("i", "j")), "j")
        .groupBy(col("i"))
        .agg(round(sum((col("cc") * col("w")).cast(DecimalType(20, 12)))
          .cast("double"), roundTo).as("u"))
    val lam = mul(w)
      .agg(round(sqrt(sum((col("u") * col("u")).cast(DecimalType(20, 12)))
        .cast("double")), roundTo).as("lambda"))
    w.crossJoin(broadcast(lam))
      .select(col("i").as("idx"), col("w").as("loading"), col("lambda"))
      .orderBy(col("idx"))
  }

  /** Shared PCA internals: (x = centered exploded values (vid, i, c),
    * cov = round-6 covariance entries (i, j, cc), w = final unit loadings
    * (i, w) after `iters` power steps). Same float discipline as
    * [[pcaTopComponent]]'s contract — every consumer inherits
    * oracle-replayability. */
  private[graft] def pcaParts(emb: DataFrame, idCol: String, vecCol: String,
                              iters: Int, roundTo: Int = 6)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.DecimalType
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = TextOps.spread(emb)
      .select(col(idCol).as("vid"), vd.as("v"))
      .filter(size(col("v")) > 0)
    val x0 = e.select(col("vid"), posexplode(col("v")))
      .select(col("vid"), col("pos").as("i"), col("col").as("xv"))
    val mean = x0.groupBy(col("i"))
      .agg(round(sum(col("xv").cast(DecimalType(20, 10))).cast("double") /
        count(lit(1)), roundTo).as("m"))
    val x = x0.join(broadcast(mean), "i")
      .select(col("vid"), col("i"), (col("xv") - col("m")).as("c"))
    // covariance = per-row outer products, aggregated on the d² keys.
    // Centering happens ROW-WISE against the one-row mean array so the
    // outer product is two stacked generates over the SAME row — fully
    // map-side; the only shuffle is the d²-key partial+final agg. The
    // previous vid-keyed self-join of the exploded values shuffled n·d
    // rows twice to build the same n·d² products (measured 2.4× slower
    // at sf0.1). Decimal partial sums are order-independent, so the cc
    // values — and every downstream hash — are bit-identical.
    val marr = mean
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("marr"))
    val cov = e.crossJoin(broadcast(marr))
      .select(zip_with(col("v"), col("marr"), (a, b) => a - b).as("carr"))
      .select(col("carr"), posexplode(col("carr")))
      .select(col("carr"), col("pos").as("i"), col("col").as("ci"))
      .select(col("i"), col("ci"), posexplode(col("carr")))
      .select(col("i"), col("ci"), col("pos").as("j"), col("col").as("cj"))
      .groupBy(col("i"), col("j"))
      .agg(round(sum((col("ci") * col("cj")).cast(DecimalType(20, 12)))
        .cast("double") / count(lit(1)), roundTo).as("cc"))
      .localCheckpoint()
    def mul(w: DataFrame): DataFrame = // u = C·w, decimal-exact per row
      cov.join(broadcast(w.withColumnRenamed("i", "j")), "j")
        .groupBy(col("i"))
        .agg(round(sum((col("cc") * col("w")).cast(DecimalType(20, 12)))
          .cast("double"), roundTo).as("u"))
    def norm(u: DataFrame): DataFrame =
      u.agg(sqrt(sum((col("u") * col("u")).cast(DecimalType(20, 12)))
        .cast("double")).as("nrm"))
    var w = mean.select(col("i"), lit(1.0).as("w"))
    for (_ <- 1 to iters) {
      val u = mul(w)
      w = u.crossJoin(broadcast(norm(u)))
        .select(col("i"),
          when(col("nrm") === 0, 0.0)
            .otherwise(round(col("u") / col("nrm"), roundTo)).as("w"))
        .localCheckpoint()
    }
    (x, cov, w)
  }

  /** "All-but-the-top" embedding postprocessing: per vector, its
    * projection onto the corpus top principal component and the squared
    * norm of the residual after removing it — the standard isotropy
    * correction for embedding spaces (dominant-direction removal). One
    * broadcast d-row join for the projection (decimal dot per vid), one
    * vid-keyed join to score the residual; linear in corpus size.
    * Returns (idCol, proj, resid2) — proj round-6, resid2 round-6. */
  def whitenTopComponent(emb: DataFrame, idCol: String, vecCol: String,
                         iters: Int = 3, roundTo: Int = 6): DataFrame = {
    val (x0, _, w) = pcaParts(emb, idCol, vecCol, iters, roundTo)
    // x feeds BOTH the projection and the residual pass — materialize once
    whitenTopComponentWith(x0.localCheckpoint(), w, idCol, roundTo)
  }

  /** [[whitenTopComponent]] against CALLER-SUPPLIED pcaParts output (`x`
    * should already be materialized — it feeds two passes). */
  def whitenTopComponentWith(x: DataFrame, w: DataFrame, idCol: String,
                             roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val proj = x.join(broadcast(w), "i")
      .groupBy(col("vid"))
      .agg(round(sum((col("c") * col("w")).cast(DecimalType(20, 12)))
        .cast("double"), roundTo).as("proj"))
    x.join(broadcast(w), "i")
      .join(proj, "vid")
      .withColumn("r", col("c") - col("proj") * col("w"))
      .groupBy(col("vid"), col("proj"))
      .agg(round(sum((col("r") * col("r")).cast(DecimalType(20, 12)))
        .cast("double"), roundTo).as("resid2"))
      .select(col("vid").as(idCol), col("proj"), col("resid2"))
      .orderBy(col(idCol))
  }

  /** Deterministic distributed Lloyd k-means — the training step the
    * IVF/PQ scale notes promised ("swap in trained codebooks"). No RNG
    * anywhere: seeds are the same ⌈√n⌉-spaced sample ivfTopK quantizes
    * with untrained, each iteration is
    *   assignment: arg-max round-6 cosine vs BROADCAST centroids (√n
    *     rows), cid tie-break — one narrow join + one vid window;
    *   update: per-(cell, dimension) means through DECIMAL(20,10) partial
    *     sums (order-independent at any partitioning), rounded to
    *     `roundTo` so every centroid component is an engine-exact double;
    * and the iteration count is FIXED. Same input ⇒ bit-identical
    * centroids on any cluster layout — the property that lets a DuckDB
    * oracle replay training as unrolled CTEs.
    *
    * Scale shape per iteration: broadcast join + window + one
    * (cid, dim)-keyed aggregation, all linear in corpus size; the ≈√n-row
    * centroid table is localCheckpointed per round so lineage stays flat.
    * Cells that lose every member drop out (standard Lloyd); surviving
    * cells keep their seed id. Returns (cid, cv: array<double>). */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      iters: Int = 2, centroidEvery: Long = 0L,
                      roundTo: Int = 6, corpusN: Long = 0L,
                      seeds: DataFrame = null): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val e = TextOps.spread(emb).select(col(idCol).as("vid"), vd.as("v"))
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("ccos").desc, col("cid"))
    // Seed rule: `id % spacing == 0` replays exactly in a SQL oracle, but
    // it is only guaranteed non-empty for DENSE integer ids. Callers whose
    // ids are hashes (the Engine's UUID-keyed serving path) pass explicit
    // `seeds` — raw 64-bit hash keys mod spacing select ZERO rows with
    // P ≈ e^(−√n), which surfaced as the r13 AnnMode empty-result flake.
    var cent =
      if (seeds != null) seeds.select(col(idCol).as("cid"), vd.as("cv"))
      else emb.filter(col(idCol) % sqrtSpacing(emb, centroidEvery, corpusN) === 0)
        .select(col(idCol).as("cid"), vd.as("cv"))
    for (_ <- 1 to iters) {
      val assigned = e.join(broadcast(cent))
        .withColumn("ccos", round(vec.cosine(col("v"), col("cv")), roundTo))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("cid"), col("v"))
      cent = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(sum(col("col").cast(DecimalType(20, 10))).cast("double") /
          count(lit(1)), roundTo).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv"))
        .localCheckpoint()
    }
    cent
  }

  /** 1/log2(pos+1) nDCG discount factors for positions 1..k as FIXED 8dp
    * constants, baked at plan-build time so both engines multiply the
    * identical literals — no runtime log() whose last ULP could differ
    * between engines. */
  def ndcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(p => BigDecimal(1.0 / (math.log(p + 1.0) / math.log(2.0)))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Ideal DCG@k under the graded-relevance convention rel(pos) = k+1−pos:
    * the round-8 terms of the perfect ranking summed exactly (the same
    * term discipline [[ndcgAt]] applies to the approximate ranking). */
  def idcgAt(k: Int): Double =
    ndcgDiscounts(k).zipWithIndex.map { case (d, i) =>
      BigDecimal((k - i).toDouble * d).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble

  /** nDCG@k of an approximate ranking against graded exact relevance —
    * the ranking-quality eval an ANN serving stack reports next to
    * recall@k: recall treats all top-k hits equally, nDCG also penalizes
    * ranking the best neighbors low. `approx` is (qid, cid, pos: 1..k),
    * `exact` is (qid, cid, rel) with missing pairs scored 0. Each DCG
    * term rounds to 8 then sums in DECIMAL(20,12), and the discounts and
    * ideal-DCG normalizer are fixed literals, so the score is
    * bit-identical at any parallelism and DuckDB-replayable. Scale: the
    * inputs are k rows per query (post-ANN); one broadcast-size left join
    * + one qid aggregation — nothing corpus-shaped. Returns
    * (qid, dcg, ndcg) rounded to `roundTo`. */
  def ndcgAt(approx: DataFrame, exact: DataFrame, k: Int,
             roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val discArr = array(ndcgDiscounts(k).map(lit): _*)
    approx.join(exact, Seq("qid", "cid"), "left")
      .withColumn("term", round(coalesce(col("rel"), lit(0)).cast("double") *
        element_at(discArr, col("pos")), 8))
      .groupBy(col("qid"))
      .agg(sum(col("term").cast(DecimalType(20, 12))).as("dcgd"))
      .select(col("qid"),
        round(col("dcgd").cast("double"), roundTo).as("dcg"),
        round(col("dcgd").cast("double") / idcgAt(k), roundTo).as("ndcg"))
      .orderBy(col("qid"))
  }

  /** MRR@k and MAP@k of an approximate ranking against a relevant set —
    * the other two standard retrieval-eval numbers beside [[ndcgAt]].
    * `approx` = (qid, cid, pos), `relevant` = (qid, cid). MRR = 1/pos of
    * the first relevant hit (0 when none); AP = Σ_{rel hits} P@pos /
    * min(|relevant|, k). Every term is a small rational a/b with b ≤ k;
    * terms are rounded before a DECIMAL sum, so the per-qid results are
    * order-independent and hash-match a sequential oracle (for b ≤ 10
    * the terminating decimal expansions stop within 3 digits, so the
    * 8-digit round is exact — no half-boundary divergence). One join +
    * one qid-partitioned window + one agg: at cluster scale all three
    * shuffles key on qid. */
  def rankEvalAt(approx: DataFrame, relevant: DataFrame, k: Int,
                 roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.expressions.Window
    val j = approx.filter(col("pos") <= k)
      .join(relevant.select(col("qid"), col("cid"), lit(1).as("rel")),
        Seq("qid", "cid"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val w = Window.partitionBy(col("qid")).orderBy(col("pos"))
    val cum = j.withColumn("cumrel", sum(col("rel")).over(w))
    val nrel = relevant.groupBy(col("qid")).agg(count(lit(1)).as("nrel"))
    cum.groupBy(col("qid"))
      .agg(
        coalesce(max(when(col("rel") === 1,
          round(lit(1.0) / col("pos"), roundTo))), lit(0.0)).as("mrr"),
        sum(when(col("rel") === 1,
          round(col("cumrel").cast("double") / col("pos"), 8))
          .otherwise(lit(0.0)).cast(DecimalType(20, 12))).as("apn"))
      .join(nrel, "qid")
      .select(col("qid"), col("mrr"),
        round(col("apn").cast("double") /
          least(col("nrel"), lit(k.toLong)), roundTo).as("ap"))
      .orderBy(col("qid"))
  }

  // ------------------------------------------------------- graph ANN (NSW)

  /** Adaptive NSW bucket count: the minimal H ∈ [4, 12] with
    * 2^H ≥ n / 32 — cells stay ≈ 32 vectors at ANY corpus size, so the
    * graph build's bucket equi-join is O(n · 32) pairs = LINEAR in n
    * (a FIXED H degrades as n²/2^H: the r14 sf1 sweep measured recall@5
    * falling 0.64 → 0.24 as cells grew 8× past the local edge budget).
    * Computed by exact integer comparisons — never ceil(log2(n)), whose
    * libm tail could flip the answer at exact power-of-two boundaries —
    * and replayed in the oracle as the SAME 9-branch CASE chain over
    * COUNT(*). The H ≤ 12 clamp bounds the rep clique at 4096² edges;
    * beyond ~130k vectors per partition-group a second navigation level
    * (bucketing the reps themselves) is the documented extension. */
  def nswPlanesFor(n: Long): Int = {
    var h = 4
    while (h < 12 && (32L << h) < n) h += 1
    h
  }

  /** NSW's own hyperplane generator, period 13: the shared
    * [[hyperplanes]] formula repeats with period 7 (plane b+7 ≡ plane b
    * mod-7 algebra), which silently collapses 2^H buckets to 2^7 for
    * H > 7 — fine for the fixed-H=4 LSH queries that own it, fatal for
    * the adaptive H ≤ 12 here. (b+3, b²) is injective mod 13 on
    * b ∈ [0, 12), so all 12 planes are distinct; components are exact
    * dyadic rationals in {-6/8 … 6/8} — deterministic cross-engine. */
  def nswHyperplanes(h: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(h)(b => Seq.tabulate(dim)(j =>
      (((j * (b + 3) + b * b) % 13) - 6) / 8.0))

  /** Deterministic NSW-style navigable graph over the corpus — the
    * graph-ANN family member (Malkov & Yashunin's NSW/HNSW is the method
    * that dominates industrial vector serving; this is its deterministic,
    * oracle-replayable form). Two edge layers:
    *
    *  - LOCAL: each node's top-`m` same-bucket neighbors by round-6
    *    cosine with id tie-breaks (sign-LSH buckets, 2^numPlanes cells) —
    *    the build is one bucket equi-join of ≈ n²/2^H pairs, never
    *    all-pairs, and H grows with n at scale exactly like the LSH
    *    dedup path;
    *  - NAVIGATION: each node ↔ its bucket's representative (min id),
    *    and the ≤ 2^H representatives pairwise — the HNSW-upper-layer
    *    analog. It guarantees GLOBAL connectivity (any node reaches any
    *    other through the rep clique in ≤ 4 hops) no matter how the
    *    buckets fragment, which pure bucket-local kNN cannot.
    *
    * Deterministic throughout (fixed hyperplanes, round-6 cosine, min-id
    * reps) ⇒ the same graph on any cluster layout, so a DuckDB oracle
    * rebuilds it bit-identically. Returns directed (src, dst), symmetric
    * by construction. */
  /** [[nswGraph]] plus the navigation layer: per bucket, the min-id rep
    * node and the bucket CENTROID (decimal-exact per-dimension means,
    * the kmeansCentroids m-step discipline — order-independent at any
    * partitioning, round-6, so the oracle replays it bit-identically).
    * The search ranks buckets by centroid cosine (an arbitrary member's
    * vector is far too noisy a proxy once buckets number in the
    * thousands — the r14 sf1 measurement: recall 0.20 rep-ranked vs
    * centroid-ranked probing) and seeds its beam with the chosen
    * buckets' reps. A serving index is the PAIR (edges, reps) with
    * reps = (bucket, rid, cent). */
  def nswIndex(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int = 8, numPlanes: Int = 0, roundTo: Int = 6,
               dim: Int = 64, corpusN: Long = 0L): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.DecimalType
    // numPlanes <= 0 → adaptive H(n): ~32-vector cells at any scale
    val h =
      if (numPlanes > 0) numPlanes
      else nswPlanesFor(if (corpusN > 0) corpusN else corpus.count())
    val planes = nswHyperplanes(h, dim)
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val b = TextOps.spread(corpus)
      .select(col(idCol).as("vid"), vd.as("v"))
      .withColumn("nv", vec.norm(col("v")))
      .withColumn("bucket", bucketCol(col("v"), planes))
      .localCheckpoint() // read 4× below (pairs ×2, reps, star)
    val pair = b.as("x").join(b.as("y"),
      col("x.bucket") === col("y.bucket") && col("x.vid") =!= col("y.vid"))
    // norms precomputed per ROW, one dot per PAIR (the oracle-perf rule
    // applies to the engine too — 3 inline dots per pair would triple the
    // dominant cost of the build)
    val cos = round(when(col("x.nv") * col("y.nv") === 0, 0.0)
      .otherwise(vec.dot(col("x.v"), col("y.v")) /
        (col("x.nv") * col("y.nv"))), roundTo)
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst"))
    val loc = pair
      .select(col("x.vid").as("src"), col("y.vid").as("dst"), cos.as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= m)
      .select(col("src"), col("dst"))
    val rep = b.groupBy(col("bucket")).agg(min(col("vid")).as("rid"))
    val star = b.join(broadcast(rep), "bucket")
      .filter(col("vid") =!= col("rid"))
      .select(col("vid").as("src"), col("rid").as("dst"))
    val hub = rep.select(col("rid").as("src"))
      .join(broadcast(rep.select(col("rid").as("dst"))),
        col("src") =!= col("dst"))
    val edges = loc
      .union(loc.select(col("dst").as("src"), col("src").as("dst")))
      .union(star)
      .union(star.select(col("dst").as("src"), col("src").as("dst")))
      .union(hub)
      .distinct()
    val cent = b.select(col("bucket"), posexplode(col("v")))
      .groupBy(col("bucket"), col("pos"))
      .agg(round(sum(col("col").cast(DecimalType(20, 10))).cast("double") /
        count(lit(1)), roundTo).as("m"))
      .groupBy(col("bucket"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cent"))
    (edges, rep.join(cent, "bucket")
      .select(col("bucket"), col("rid"), col("cent")))
  }

  /** Edge list only — see [[nswIndex]]. */
  def nswGraph(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int = 8, numPlanes: Int = 0, roundTo: Int = 6,
               dim: Int = 64, corpusN: Long = 0L): DataFrame =
    nswIndex(corpus, idCol, vecCol, m, numPlanes, roundTo, dim, corpusN)._1

  /** Greedy beam search over [[nswIndex]] for a query BATCH — the HNSW
    * two-phase shape: (1) search the NAVIGATION layer exhaustively —
    * score every rep against the query (reps ≈ n/32, a 32×-cheaper
    * coarse scan, exactly IVF's centroid ranking) and seed the beam with
    * the `beamWidth` best; (2) descend — expand the beam's out-edges for
    * a FIXED number of hops, keeping the `beamWidth` best (round-6
    * cosine, id tie-break) after each hop; answer = top-k over
    * everything VISITED. Seeding from the min-id node alone was the r14
    * first cut — greedy eviction drops hub reps before their buckets are
    * explored (hubs score poorly as query matches), which cost recall at
    * every scale. The fixed unroll is what makes the search
    * oracle-replayable as MATERIALIZED level CTEs (the q_graph_sssp
    * shape); per hop the work is |Q|·beamWidth·degree candidate rows,
    * independent of n once the graph is built.
    * Returns (qid, cand, score, rn ≤ k). */
  def nswTopKQueries(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     k: Int, m: Int = 8, numPlanes: Int = 0,
                     beamWidth: Int = 8, hops: Int = 3,
                     roundTo: Int = 6, dim: Int = 64,
                     index: Option[(DataFrame, DataFrame)] = None,
                     corpusN: Long = 0L,
                     normedCorpus: Option[DataFrame] = None): DataFrame = {
    // a production serving path builds the navigable index ONCE per
    // corpus snapshot and amortizes it across queries — callers pass the
    // memoized (already-checkpointed) (edges, reps) and, optionally, the
    // normed-corpus frame (cid, cv, ncv) from the same snapshot (the
    // scoring side re-reads it once per hop — re-deriving it per CALL
    // paid one full corpus materialization per query); ad-hoc calls
    // build both inline
    val (edges, reps) = index.getOrElse {
      val (e0, r0) = nswIndex(corpus, idCol, vecCol, m, numPlanes,
        roundTo, dim, corpusN)
      (e0.localCheckpoint(), r0.localCheckpoint())
    }
    val vd = col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val qd = col(qVecCol).cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val c = normedCorpus.getOrElse(
      corpus.select(col(idCol).as("cid"), vd.as("cv"))
        .withColumn("ncv", vec.norm(col("cv")))
        .localCheckpoint())
    // the query frame is broadcast-joined at the seed stage and at every
    // hop (~2+hops references) — checkpoint it so a non-literal query
    // source (e.g. a parquet-backed filter) is scanned once, not per hop
    val q = queries.select(col(qIdCol).as("qid"), qd.as("qv"))
      .withColumn("nq", vec.norm(col("qv")))
      .localCheckpoint()
    val score = round(when(col("ncv") * col("nq") === 0, 0.0)
      .otherwise(vec.dot(col("cv"), col("qv")) /
        (col("ncv") * col("nq"))), roundTo)
    val wB = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid"))
    // phase 1 — upper-layer search: rank BUCKETS by centroid cosine
    // (~n/32 centroid rows; queries broadcast), pick the beamWidth best
    // per query, seed the beam with their rep nodes scored by their OWN
    // vectors (so every visited row carries a true node score). Windows
    // partition by qid — never global.
    val centScore = round(when(col("ncn") * col("nq") === 0, 0.0)
      .otherwise(vec.dot(col("cent"), col("qv")) /
        (col("ncn") * col("nq"))), roundTo)
    val wSel = Window.partitionBy(col("qid"))
      .orderBy(col("cscore").desc, col("bucket"))
    // probe 2× beamWidth buckets: seeding costs one tiny join and every
    // probed bucket's members land in VISITED at hop 1 (the answer pool),
    // so extra probes buy recall even though the beam then narrows
    val sel = reps.withColumn("ncn", vec.norm(col("cent")))
      .join(broadcast(q))
      .select(col("qid"), col("bucket"), col("rid"), centScore.as("cscore"))
      .withColumn("rn", row_number().over(wSel))
      .filter(col("rn") <= 2 * beamWidth)
      .select(col("qid"), col("rid").as("cid"))
    var beam = sel.join(c, "cid").join(broadcast(q), "qid")
      .select(col("qid"), col("cid"), score.as("score"))
      .localCheckpoint()
    // Dedup + top-N fused into ONE window pass (r14-opt): duplicates are
    // always IDENTICAL (qid, cid, score) triples (score is a function of
    // (qid, cid)), so under the (score desc, cid) total order they sit
    // adjacent — `lag(cid)` marks the first copy, and a ROWS-framed
    // running count of firsts is exactly "row_number over the deduped
    // set". The old distinct() + row_number() chain paid two shuffles
    // per hop for the same answer; this pays one (both window functions
    // share the single partition/order spec → one WindowExec, one sort).
    val prevCid = lag(col("cid"), 1).over(wB)
    val dedupRank = sum(when(prevCid.isNull || prevCid =!= col("cid"), 1L)
      .otherwise(0L))
      .over(wB.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    def topDeduped(in: DataFrame, n: Int): DataFrame =
      in.withColumn("__first", prevCid.isNull || prevCid =!= col("cid"))
        .withColumn("rn", dedupRank)
        .filter(col("__first") && col("rn") <= n)
    // VISITED accumulates lazily: each hop's scored frame hangs off the
    // PREVIOUS hop's checkpointed beam (a shallow, bounded subtree), so
    // only the beam needs an eager per-hop materialization — the old
    // per-hop visited.distinct().localCheckpoint() was `hops` extra
    // eager jobs + `hops` extra distinct shuffles whose only consumer is
    // the single final top-k, which dedups once anyway.
    var visitedParts = List(beam)
    for (_ <- 1 to hops) {
      // no exp.distinct(): duplicate expansion targets re-score the same
      // (qid, cid) to the same value and the window dedups them — the
      // distinct's shuffle cost more than the few duplicate dot products
      // it saved (frontier ≤ beam·degree rows per query, at any scale)
      val exp = beam.select(col("qid"), col("cid"))
        .join(edges, col("cid") === col("src"))
        .select(col("qid"), col("dst").as("cid"))
      val scored = exp.join(c, "cid").join(broadcast(q), "qid")
        .select(col("qid"), col("cid"), score.as("score"))
      beam = topDeduped(scored.unionByName(beam), beamWidth)
        .select(col("qid"), col("cid"), col("score"))
        .localCheckpoint()
      visitedParts ::= scored
    }
    topDeduped(visitedParts.reduce(_ unionByName _), k)
      .select(col("qid"), col("cid").as("cand"), col("score"),
        col("rn").cast("int").as("rn"))
  }

  /** Single-query [[nswTopKQueries]] over a literal query vector:
    * returns (idCol, score) top-k, the q_ann_ivf-style serving shape. */
  def nswTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queryVec: Seq[Double], k: Int, m: Int = 8,
              numPlanes: Int = 0, beamWidth: Int = 8, hops: Int = 3,
              roundTo: Int = 6,
              index: Option[(DataFrame, DataFrame)] = None,
              corpusN: Long = 0L,
              normedCorpus: Option[DataFrame] = None): DataFrame = {
    val q = corpus.sparkSession.range(1)
      .select(lit(0L).as("qid"), typedlit(queryVec).as("qv"))
    nswTopKQueries(corpus, idCol, vecCol, q, "qid", "qv", k, m,
        numPlanes, beamWidth, hops, roundTo, dim = queryVec.length,
        index = index, corpusN = corpusN, normedCorpus = normedCorpus)
      .select(col("cand").as(idCol), col("score"))
  }
}
