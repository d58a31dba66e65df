package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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
  *   - in-vectors hash-initialized in [-0.1, 0.1] (round-6 rationals),
  *     out-vectors zero-initialized (the word2vec convention — and the
  *     symmetry breaker: with u ≠ 0, iteration 1 moves the out-table,
  *     iteration 2 onward moves both);
  *   - per pair-group z = Σ_k u·c summed as DECIMAL of round-8 terms
  *     (the d-term dot product must not depend on dim arrival order),
  *     round-8 sigmoid (single exp, ≤ 8dp per invariant 10);
  *   - per (node, dim) gradient sums in DECIMAL(20,10) of round-8
  *     terms scaled by exact pair multiplicities — associative, so
  *     partition-order-independent; divide by the node's own pair
  *     count, round-8, learning step, round-6 weights;
  *   - iteration count FIXED, same input ⇒ bit-identical embeddings
  *     on any cluster layout (NodeEmbeddingSpec pins this).
  *
  * Scale shape per iteration: the pair-group table joins the two
  * (|V|·d)-row weight tables on node — shuffles keyed by node/dim,
  * no window over the corpus, no driver state; the only global window
  * is the vocabulary rank (|V| rows, PlanScan-reviewed). At 100 TB
  * the corpus feeds ONE groupBy into pair-groups; everything after is
  * proportional to |pairs| + |V|·d.
  */
object NodeEmbedding {

  private def dec(c: Column) = c.cast(DecimalType(20, 10))

  /** Vocabulary with dense 0-based rank (the negative-sampling index)
    * and its 1-row size frame. The rank window is global over the NODE
    * table — |V| rows, not corpus rows (PlanScan-reviewed). */
  def vocabRank(nodes: DataFrame): (DataFrame, DataFrame) = {
    val vr = nodes.select(col("n"),
      (row_number().over(Window.orderBy(col("n"))) - 1).as("rk"))
      .localCheckpoint()
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

  /** Hash-initialized in-vectors: round-6 rationals in [-0.1, 0.1],
    * u0(n,k) = ((H("u:n:k") mod 2001) − 1000) / 10000. */
  def initIn(vr: DataFrame, d: Int): DataFrame = {
    val dims = vr.sparkSession.range(d).select(col("id").cast("int").as("k"))
    vr.select(col("n")).crossJoin(broadcast(dims))
      .select(col("n"), col("k"),
        round(((TextOps.strHash(concat(lit("u:"), col("n").cast("string"),
          lit(":"), col("k").cast("string"))) % 2001) - 1000) / 10000.0, 6)
          .as("val"))
  }

  /** One synchronous full-batch SGNS step: both gradient passes read
    * the PRE-update tables; nodes/dims untouched by any pair keep
    * their weight bit-for-bit (left join, not coalesce-to-0 update). */
  private[graft] def step(rows: DataFrame, u: DataFrame, c: DataFrame,
                          lr: Double): (DataFrame, DataFrame) = {
    val e = rows
      .join(u.select(col("n").as("ctr"), col("k"), col("val").as("uv")), "ctr")
      .join(c.select(col("n").as("ctx"), col("k"), col("val").as("cv")),
        Seq("ctx", "k"))
      .groupBy(col("ctr"), col("ctx"), col("y"), col("m"))
      .agg(round(sum(dec(round(col("uv") * col("cv"), 8))).cast("double"), 8)
        .as("z"))
      .withColumn("err",
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 8) - col("y"))
      .localCheckpoint()
    def grads(keyCol: String, w: DataFrame, wKey: String) = e
      .join(w.select(col("n").as(wKey), col("k"), col("val").as("wv")), wKey)
      .groupBy(col(keyCol).as("n"), col("k"))
      .agg(sum(dec(round(col("err") * col("wv"), 8)) * col("m")).as("g"),
        sum(col("m")).as("cnt"))
    // The step is rounded to the WEIGHT grid (6dp) before subtraction:
    // an 8dp step minus a 6dp weight lands on exact .xxxxxx5 half-way
    // points ~1% of the time, where Spark's BigDecimal HALF_UP and
    // DuckDB's float rounding can split (observed once in 384 cells at
    // sf0.001). With both operands on the 6dp grid the difference IS a
    // grid point, so the outer round only strips float noise — no
    // half-way case can exist.
    def apply(w: DataFrame, g: DataFrame) = w
      .join(g, Seq("n", "k"), "left")
      .select(col("n"), col("k"),
        when(col("g").isNull, col("val"))
          .otherwise(round(col("val") -
            round(lit(lr) * col("g").cast("double") / col("cnt"), 6), 6))
          .as("val"))
      .localCheckpoint()
    (apply(u, grads("ctr", c, "ctx")), apply(c, grads("ctx", u, "ctr")))
  }

  /** Train and return the in-vector table (n, k, val) after `iters`
    * fixed steps. `nodes` is the FULL vocabulary (negative draws index
    * all of it, so out-vectors exist for every node). */
  def trainSgns(walks: DataFrame, nodes: DataFrame, d: Int = 4,
                window: Int = 2, negatives: Int = 2, iters: Int = 3,
                lr: Double = 1.0): DataFrame = {
    val (vr, nvDf) = vocabRank(nodes)
    val rows = pairGroups(walks, vr, nvDf, window, negatives)
    var u = initIn(vr, d).localCheckpoint()
    var c = vr.sparkSession.emptyDataFrame
    c = u.select(col("n"), col("k"), lit(0.0).as("val")).localCheckpoint()
    for (_ <- 1 to iters) {
      val (u2, c2) = step(rows, u, c, lr)
      u = u2; c = c2
    }
    u
  }

  /** Link-prediction evaluation of a trained in-vector table: positive
    * class = the graph's own edges, negative class = one hash-drawn
    * node pair per edge that is NOT an edge (anti-join both
    * orientations). Score = round-8 DECIMAL-summed in-vector dot;
    * AUC = tie-aware Mann-Whitney over the DISTINCT-score histogram
    * (exact BIGINT counts until one final division — the evalSweep
    * recipe; the ordered window runs over distinct round-8 scores,
    * never corpus rows). Returns one row:
    * (n_pos, n_neg, mean_pos, mean_neg, auc). */
  def linkAuc(emb: DataFrame, edges: DataFrame, vr: DataFrame,
              nvDf: DataFrame): DataFrame = {
    def score(df: DataFrame) = df
      .join(emb.select(col("n").as("na"), col("k"), col("val").as("va")), "na")
      .join(emb.select(col("n").as("nb"), col("k"), col("val").as("vb")),
        Seq("nb", "k"))
      .groupBy(col("na"), col("nb"), col("y"))
      .agg(round(sum(dec(round(col("va") * col("vb"), 8))).cast("double"), 8)
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
      round(sum(when(col("y") === 1.0, dec(col("s")))).cast("double") /
        sum(when(col("y") === 1.0, 1L).otherwise(0L)), 6).as("mean_pos"),
      round(sum(when(col("y") === 0.0, dec(col("s")))).cast("double") /
        sum(when(col("y") === 0.0, 1L).otherwise(0L)), 6).as("mean_neg"))
    val wCum = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val auc = groups
      .withColumn("cumneg", coalesce(sum(col("nn")).over(wCum), lit(0L)))
      .agg(sum(col("np") * (lit(2L) * col("cumneg") + col("nn"))).as("c2"))
    tot.crossJoin(broadcast(auc))
      .select(col("n_pos"), col("n_neg"), col("mean_pos"), col("mean_neg"),
        round(col("c2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }
}
