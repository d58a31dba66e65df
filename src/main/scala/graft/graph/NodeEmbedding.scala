package graft.graph

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}
import graft.pipeline.TextOps

/** Deterministic in-engine node-embedding training — the consumer the
  * walk corpora (graph/Walks.scala) were missing: skip-gram with
  * negative sampling (word2vec SGNS — Mikolov et al. NIPS'13, applied
  * to walks as DeepWalk, Perozzi et al. KDD'14) trained by full-batch
  * gradient descent under the Classifier.scala float discipline, so
  * the trained vectors are a pure function of the graph and a DuckDB
  * oracle replays every iteration:
  *   - positive pairs = walk co-occurrences within `window` steps;
  *     negatives drawn per pair by the cross-engine hash against the
  *     rank-indexed vocabulary (hash-based "unigram table");
  *   - in-vectors hash-initialized in [-0.1, 0.1] (6dp rationals),
  *     out-vectors zero-initialized (the word2vec convention — and the
  *     symmetry breaker: with u ≠ 0, iteration 1 moves the out-table,
  *     iteration 2 onward moves both);
  *   - per pair-group z = Σ_k u·c summed as DECIMAL of 8dp terms
  *     (the d-term dot product must not depend on dim arrival order),
  *     8dp sigmoid (single exp, ≤ 8dp per invariant 10);
  *   - per (node, dim) gradient sums in DECIMAL(20,10) of 8dp terms
  *     scaled by exact pair multiplicities — associative, so
  *     partition-order-independent; divide by the node's own pair
  *     count, 6dp learning step, 6dp weights;
  *   - iteration count FIXED, same input ⇒ bit-identical embeddings
  *     on any cluster layout (NodeEmbeddingSpec pins this).
  *
  * ROUNDING (round-10 post-mortem): every rounding inside the GD loop
  * uses [[pround]] — `floor(x·10^k + 0.5)/10^k` — NOT `round(x, k)`.
  * round()'s tie-breaking differs cross-engine (Spark: BigDecimal
  * HALF_UP on the exact binary expansion; DuckDB: multiply-by-10^k
  * then nearbyint), and r10's q_graph_embeddings shipped red on
  * exactly that split: ONE weight cell off by exactly 1e-6, traced to
  * the inner round(lr·g/cnt, 6) of an unconstrained double quotient.
  * floor, ×, +, / are all IEEE-754 correctly-rounded, so pround is
  * bit-identical across engines BY CONSTRUCTION on the same input —
  * no tie semantics exist to disagree on. The oracle (SelectionQueries
  * sgnsCtes) spells the identical formula text.
  *
  * Scale shape per iteration: the pair-group table joins the two
  * (|V|·d)-row weight tables on node — shuffles keyed by node/dim,
  * no window over the corpus, no driver state; the vocabulary rank is
  * a distributed range-sort + zipWithIndex (the round-3
  * stringVertexMapping pattern — no single-task sort at any |V|). At
  * 100 TB the corpus feeds ONE groupBy into pair-groups; everything
  * after is proportional to |pairs| + |V|·d.
  */
object NodeEmbedding {

  private def dec(c: Column) = c.cast(DecimalType(20, 10))

  /** Engine-portable fixed-point rounding: floor(x·10^k + 0.5)/10^k.
    * Unlike round(x, k), every constituent op is IEEE-correctly-rounded
    * and tie-free, so Spark and DuckDB produce bit-identical doubles on
    * the same input (see object Scaladoc; halves round toward +inf on
    * BOTH engines instead of away-from-zero — a consistent convention,
    * which is all the cross-engine hash needs). */
  private[graft] def pround(c: Column, k: Int): Column = {
    val p = math.pow(10, k) // 10^k ≤ 1e8 — exactly representable
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Vocabulary with dense 0-based rank (the negative-sampling index)
    * and its 1-row size frame. NO global window (r10 perf-weak item):
    * |V| grows with the corpus for sparseEdges-class graphs, so the
    * rank comes from a distributed range-sort + zipWithIndex — same
    * total order (ids are distinct, NULLs dropped on both engines),
    * no single-task sort at any |V|. */
  def vocabRank(nodes: DataFrame): (DataFrame, DataFrame) = {
    val s = nodes.sparkSession
    val nn = nodes.select(col("n")).filter(col("n").isNotNull)
    val schema = StructType(nn.schema.fields :+
      StructField("rk", LongType, nullable = false))
    val rdd = nn.sort(col("n")).rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    val vr = s.createDataFrame(rdd, schema).localCheckpoint()
    (vr, vr.agg(count(lit(1)).as("nv")))
  }

  /** Training pair-groups from a walk corpus (wid, step, node):
    * positives = ordered co-occurrences within `window` steps (both
    * directions fall out of the s1 ≠ s2 self-join); `negatives`
    * hash-drawn context nodes per positive, labeled 0. Grouped to
    * (ctr, ctx, y, m) so identical pairs carry exact integer
    * multiplicity instead of duplicate rows. */
  def pairGroups(walks: DataFrame, vr: DataFrame, nvDf: DataFrame,
                 window: Int, negatives: Int): DataFrame = {
    val a = walks.select(col("wid"), col("step").as("s1"), col("node").as("ctr"))
    val b = walks.select(col("wid"), col("step").as("s2"), col("node").as("ctx"))
    val pos = a.join(b, "wid")
      .filter(col("s1") =!= col("s2") &&
        abs(col("s1") - col("s2")) <= window)
      .localCheckpoint()
    val negs = (1 to negatives).map { j =>
      pos.crossJoin(broadcast(nvDf))
        .withColumn("rk", TextOps.strHash(
          concat(col("wid").cast("string"), lit(":"),
            col("s1").cast("string"), lit(":"),
            col("s2").cast("string"), lit(s":n$j"))) % col("nv"))
        .join(vr.select(col("rk"), col("n").as("negctx")), "rk")
        .select(col("ctr"), col("negctx").as("ctx"))
    }
    pos.select(col("ctr"), col("ctx"), lit(1.0).as("y"))
      .unionByName(negs.map(_.withColumn("y", lit(0.0))).reduce(_ unionByName _))
      .groupBy(col("ctr"), col("ctx"), col("y"))
      .agg(count(lit(1)).as("m"))
      .localCheckpoint()
  }

  /** Hash-initialized in-vectors: 6dp rationals in [-0.1, 0.1],
    * u0(n,k) = ((H("u:n:k") mod 2001) − 1000) / 10000 (exact single
    * IEEE division of a 4-digit integer — pround(·,6) is a no-op
    * numerically, kept for uniformity with the loop). */
  def initIn(vr: DataFrame, d: Int): DataFrame = {
    val dims = vr.sparkSession.range(d).select(col("id").cast("int").as("k"))
    vr.select(col("n")).crossJoin(broadcast(dims))
      .select(col("n"), col("k"),
        pround(((TextOps.strHash(concat(lit("u:"), col("n").cast("string"),
          lit(":"), col("k").cast("string"))) % 2001) - 1000) / 10000.0, 6)
          .as("val"))
  }

  /** One synchronous full-batch SGNS step: both gradient passes read
    * the PRE-update tables; nodes/dims untouched by any pair keep
    * their weight bit-for-bit (left join, not coalesce-to-0 update).
    * ONE localCheckpoint barrier per weight update (the two updated
    * tables union under a tag and checkpoint together — r10's per-table
    * checkpoints made the two embed queries #1/#2 in the whole bench). */
  private[graft] def step(rows: DataFrame, u: DataFrame, c: DataFrame,
                          lr: Double): (DataFrame, DataFrame) = {
    val e = rows
      .join(u.select(col("n").as("ctr"), col("k"), col("val").as("uv")), "ctr")
      .join(c.select(col("n").as("ctx"), col("k"), col("val").as("cv")),
        Seq("ctx", "k"))
      .groupBy(col("ctr"), col("ctx"), col("y"), col("m"))
      .agg(pround(sum(dec(pround(col("uv") * col("cv"), 8))).cast("double"), 8)
        .as("z"))
      .withColumn("err",
        pround(lit(1.0) / (lit(1.0) + exp(-col("z"))), 8) - col("y"))
      .localCheckpoint()
    // m is cast to DECIMAL(12,0), NOT left as BIGINT: DECIMAL(20,10) ×
    // BIGINT promotes to precision 20+20+1 = 41 > 38, and Spark's
    // adjustPrecisionScale silently REDUCES THE SCALE TO 7 — each 8dp
    // term lost its last digit before summing while DuckDB kept scale
    // 10, which was the ACTUAL root cause of r10's one-cell-off-by-1e-6
    // red (not round()-tie semantics: every term matched bit-for-bit,
    // the sums differed). 20+12+1 = 33 ≤ 38 keeps the product exact.
    def grads(keyCol: String, w: DataFrame, wKey: String) = e
      .join(w.select(col("n").as(wKey), col("k"), col("val").as("wv")), wKey)
      .groupBy(col(keyCol).as("n"), col("k"))
      .agg(sum(dec(pround(col("err") * col("wv"), 8)) *
          col("m").cast(DecimalType(12, 0))).as("g"),
        sum(col("m")).as("cnt"))
    // The step is rounded to the WEIGHT grid (6dp) before subtraction,
    // so the difference IS a grid point and the outer pround only
    // strips float noise; both roundings are pround, hence bit-identical
    // to the oracle's floor-formula by construction (object Scaladoc).
    def apply(w: DataFrame, g: DataFrame) = w
      .join(g, Seq("n", "k"), "left")
      .select(col("n"), col("k"),
        when(col("g").isNull, col("val"))
          .otherwise(pround(col("val") -
            pround(lit(lr) * col("g").cast("double") / col("cnt"), 6), 6))
          .as("val"))
    val tagged = apply(u, grads("ctr", c, "ctx")).withColumn("t", lit("u"))
      .unionByName(apply(c, grads("ctx", u, "ctr")).withColumn("t", lit("c")))
      .localCheckpoint()
    (tagged.filter(col("t") === "u").drop("t"),
      tagged.filter(col("t") === "c").drop("t"))
  }

  /** Train and return the in-vector table (n, k, val) after `iters`
    * fixed steps, reusing a pre-built vocabulary (so callers that also
    * need vr/nv — e.g. the AUC eval — build it once). */
  def trainSgnsFrom(walks: DataFrame, vr: DataFrame, nvDf: DataFrame,
                    d: Int = 4, window: Int = 2, negatives: Int = 2,
                    iters: Int = 3, lr: Double = 1.0): DataFrame = {
    val rows = pairGroups(walks, vr, nvDf, window, negatives)
    val init = initIn(vr, d)
    val tagged = init.withColumn("t", lit("u"))
      .unionByName(init.select(col("n"), col("k"), lit(0.0).as("val"))
        .withColumn("t", lit("c")))
      .localCheckpoint()
    var u = tagged.filter(col("t") === "u").drop("t")
    var c = tagged.filter(col("t") === "c").drop("t")
    for (_ <- 1 to iters) {
      val (u2, c2) = step(rows, u, c, lr)
      u = u2; c = c2
    }
    u
  }

  /** Train and return the in-vector table (n, k, val) after `iters`
    * fixed steps. `nodes` is the FULL vocabulary (negative draws index
    * all of it, so out-vectors exist for every node). */
  def trainSgns(walks: DataFrame, nodes: DataFrame, d: Int = 4,
                window: Int = 2, negatives: Int = 2, iters: Int = 3,
                lr: Double = 1.0): DataFrame = {
    val (vr, nvDf) = vocabRank(nodes)
    trainSgnsFrom(walks, vr, nvDf, d, window, negatives, iters, lr)
  }

  /** Link-prediction evaluation of a trained in-vector table: positive
    * class = the graph's own edges, negative class = one hash-drawn
    * node pair per edge that is NOT an edge (anti-join both
    * orientations). Score = 8dp DECIMAL-summed in-vector dot;
    * AUC = tie-aware Mann-Whitney over the DISTINCT-score histogram
    * (exact BIGINT counts until one final division — the evalSweep
    * recipe; the ordered window runs over distinct 8dp scores,
    * never corpus rows). Returns one row:
    * (n_pos, n_neg, mean_pos, mean_neg, auc). */
  def linkAuc(emb: DataFrame, edges: DataFrame, vr: DataFrame,
              nvDf: DataFrame): DataFrame = {
    def score(df: DataFrame) = df
      .join(emb.select(col("n").as("na"), col("k"), col("val").as("va")), "na")
      .join(emb.select(col("n").as("nb"), col("k"), col("val").as("vb")),
        Seq("nb", "k"))
      .groupBy(col("na"), col("nb"), col("y"))
      .agg(pround(sum(dec(pround(col("va") * col("vb"), 8))).cast("double"), 8)
        .as("s"))
    val pos = edges.select(col("src").as("na"), col("dst").as("nb"),
      lit(1.0).as("y"))
    val cand = edges.crossJoin(broadcast(nvDf))
      .select(
        (TextOps.strHash(concat(lit("na:"), col("src").cast("string"),
          lit(":"), col("dst").cast("string"))) % col("nv")).as("rka"),
        (TextOps.strHash(concat(lit("nb:"), col("src").cast("string"),
          lit(":"), col("dst").cast("string"))) % col("nv")).as("rkb"))
      .join(vr.select(col("rk").as("rka"), col("n").as("na")), "rka")
      .join(vr.select(col("rk").as("rkb"), col("n").as("nb")), "rkb")
      .filter(col("na") =!= col("nb"))
    val und = edges.select(col("src").as("na"), col("dst").as("nb"))
      .unionByName(edges.select(col("dst").as("na"), col("src").as("nb")))
    val neg = cand.select(col("na"), col("nb"))
      .join(und, Seq("na", "nb"), "left_anti")
      .distinct()
      .withColumn("y", lit(0.0))
    val scored = score(pos.unionByName(neg)).localCheckpoint()
    val groups = scored.groupBy(col("s"))
      .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
    val tot = scored.agg(
      sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("n_neg"),
      pround(sum(when(col("y") === 1.0, dec(col("s")))).cast("double") /
        sum(when(col("y") === 1.0, 1L).otherwise(0L)), 6).as("mean_pos"),
      pround(sum(when(col("y") === 0.0, dec(col("s")))).cast("double") /
        sum(when(col("y") === 0.0, 1L).otherwise(0L)), 6).as("mean_neg"))
    val wCum = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val auc = groups
      .withColumn("cumneg", coalesce(sum(col("nn")).over(wCum), lit(0L)))
      .agg(sum(col("np") * (lit(2L) * col("cumneg") + col("nn"))).as("c2"))
    tot.crossJoin(broadcast(auc))
      .select(col("n_pos"), col("n_neg"), col("mean_pos"), col("mean_neg"),
        pround(col("c2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }
}
