package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic in-engine classifier training — the quality-filter model
  * step of a training-data pipeline (fastText-style doc scorers, CCNet
  * quality LMs): learn weights from corpus features INSIDE the engine, so
  * the filter is versioned with the data it was fit on, instead of an
  * opaque side-loaded binary.
  *
  * Full-batch logistic regression by gradient descent with the same float
  * discipline as the other trained artifacts (k-means, BPE, PCA):
  *   - features arrive round-6;
  *   - the margin z and the sigmoid p are rounded to 8dp (single exp per
  *     row — the same tame-the-libm-tail rule the perplexity/TF-IDF `ln`
  *     paths use);
  *   - per-feature gradient sums run in DECIMAL(20,10) (order-independent
  *     at any partitioning), divide by n as a double, round-8;
  *   - weight updates round-6; iteration count FIXED, weights seeded 0.
  * Same input ⇒ bit-identical weights on any cluster layout, so a DuckDB
  * oracle replays every iteration as unrolled CTEs.
  *
  * Scale shape per iteration: ONE pass over the feature table (the 1-row
  * weight vector is a broadcast crossJoin) into a partial+final aggregate
  * of d+1 decimal sums — gradient descent at 100 TB is exactly as
  * expensive as d+1 distributed sums per step, nothing else.
  */
object Classifier {

  /** One GD step's updated 1-row weight frame. `feat` must carry y and
    * x1..x3 (x0 is the implicit bias 1). */
  private def step(feat: DataFrame, w: DataFrame, lr: Double): DataFrame = {
    def dec(c: Column) = c.cast(DecimalType(20, 10))
    val p = round(lit(1.0) / (lit(1.0) +
      exp(-round(col("w0") + col("w1") * col("x1") +
        col("w2") * col("x2") + col("w3") * col("x3"), 8))), 8)
    val g = feat.crossJoin(broadcast(w))
      .withColumn("d", p - col("y"))
      .agg(
        sum(dec(round(col("d"), 8))).as("s0"),
        sum(dec(round(col("d") * col("x1"), 8))).as("s1"),
        sum(dec(round(col("d") * col("x2"), 8))).as("s2"),
        sum(dec(round(col("d") * col("x3"), 8))).as("s3"),
        count(lit(1)).as("n"))
    w.crossJoin(broadcast(g))
      .select(
        round(col("w0") - lit(lr) * round(col("s0").cast("double") / col("n"), 8), 6).as("w0"),
        round(col("w1") - lit(lr) * round(col("s1").cast("double") / col("n"), 8), 6).as("w1"),
        round(col("w2") - lit(lr) * round(col("s2").cast("double") / col("n"), 8), 6).as("w2"),
        round(col("w3") - lit(lr) * round(col("s3").cast("double") / col("n"), 8), 6).as("w3"))
      .localCheckpoint()
  }

  /** The 1-row trained weight frame (w0..w3) after `iters` fixed GD
    * steps from a zero start — the public entry the declared-query memo
    * uses (training is bit-deterministic, so sharing the trained row
    * across the three classifier queries cannot change any result; the
    * trainedCentMemo convention). */
  def trainWeights(feat0: DataFrame, iters: Int, lr: Double): DataFrame =
    weightsFrame(feat0.localCheckpoint(), iters, lr).localCheckpoint()

  private def weightsFrame(feat: DataFrame, iters: Int, lr: Double): DataFrame = {
    var w = feat.sparkSession.range(1).select(
      lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"), lit(0.0).as("w3"))
    for (_ <- 1 to iters) w = step(feat, w, lr)
    w
  }

  /** Round-8 sigmoid score of the (broadcast) weight row against a
    * feature row — the single scoring expression every consumer shares,
    * so Spark and the oracle agree bit-for-bit. */
  private def scoreExpr: Column = round(lit(1.0) / (lit(1.0) +
    exp(-round(col("w0") + col("w1") * col("x1") +
      col("w2") * col("x2") + col("w3") * col("x3"), 8))), 8)

  /** Train on a feature frame with columns (y ∈ {0,1} double, x1, x2, x3
    * round-6 doubles). Returns one row per coefficient:
    * (feature, weight, train_acc) — train_acc is the ≥0.5-threshold
    * accuracy of the FINAL weights on the training set. */
  def trainLogReg(feat0: DataFrame, names: Seq[String],
                  iters: Int = 3, lr: Double = 2.0,
                  trained: Option[DataFrame] = None): DataFrame = {
    require(names.length == 4, "bias + 3 feature names")
    // every GD step re-reads the features; materialize the (narrow,
    // 4-double) frame once instead of re-tokenizing the corpus per pass
    val feat = feat0.localCheckpoint()
    val w = trained.getOrElse(weightsFrame(feat, iters, lr))
    val p = scoreExpr
    val acc = feat.crossJoin(broadcast(w))
      .agg(round(avg(when((p >= 0.5) === (col("y") === 1.0), 1.0)
        .otherwise(0.0)), 6).as("train_acc"))
    val Seq(n0, n1, n2, n3) = names
    w.crossJoin(broadcast(acc))
      .select(expr(
        s"stack(4, '$n0', w0, '$n1', w1, '$n2', w2, '$n3', w3) AS (feature, weight)"),
        col("train_acc"))
      .orderBy(col("feature"))
  }

  /** Threshold sweep + rank AUC of the trained model on its training
    * set — the numbers that make a quality filter FALSIFIABLE (a
    * classifier without an operating curve is a guess; picking the
    * production threshold IS this table). Returns 9 rows, one per
    * threshold k/10: (thr, tp, fp, fn, tn, precision, recall, f1, auc).
    *
    * Everything is computed off ONE corpus pass: scores aggregate to a
    * per-distinct-score (np, nn) count table — bounded by the round-8
    * sigmoid domain (≤ 1e8+1 rows) and in practice by the distinct
    * feature combinations, NOT the corpus — and every downstream step
    * (cumulative negatives, 9-threshold sweep) runs on that small table.
    * AUC is the tie-aware Mann-Whitney form: with per-score cumulative
    * negatives, Σ np·(2·cumneg + nn) / (2·npos·nneg) — EXACT BIGINTs
    * until the one final division (the modularity discipline), so the
    * hash matches the oracle at any parallelism. The ordered window runs
    * over the distinct-score table only (documented bounded domain — a
    * global window over the corpus would be the rrfFuse scale-killer). */
  def evalSweep(feat0: DataFrame, iters: Int = 5, lr: Double = 2.0,
                trained: Option[DataFrame] = None): DataFrame = {
    val feat = feat0.localCheckpoint()
    val w = trained.getOrElse(weightsFrame(feat, iters, lr))
    val groups = feat.crossJoin(broadcast(w))
      .select(scoreExpr.as("s"), col("y"))
      .groupBy(col("s"))
      .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
      .localCheckpoint()
    val tot = groups.agg(sum(col("np")).as("npos"), sum(col("nn")).as("nneg"))
    val wCum = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val auc = groups
      .withColumn("cumneg", coalesce(sum(col("nn")).over(wCum), lit(0L)))
      .agg(sum(col("np") * (lit(2L) * col("cumneg") + col("nn"))).as("c2"))
      .crossJoin(broadcast(tot))
      .select(round(col("c2").cast("double") /
        (lit(2.0) * col("npos") * col("nneg")), 6).as("auc"))
    val thr = feat.sparkSession.range(1)
      .select(explode(sequence(lit(1), lit(9))).as("k"))
      .select((col("k") / 10.0).as("thr"))
    thr.crossJoin(groups)
      .groupBy(col("thr"))
      .agg(coalesce(sum(when(col("s") >= col("thr"), col("np"))), lit(0L)).as("tp"),
        coalesce(sum(when(col("s") >= col("thr"), col("nn"))), lit(0L)).as("fp"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(auc))
      .select(col("thr"), col("tp"), col("fp"),
        (col("npos") - col("tp")).as("fn"), (col("nneg") - col("fp")).as("tn"),
        round(col("tp").cast("double") /
          nullif(col("tp") + col("fp"), lit(0L)), 6).as("precision"),
        round(col("tp").cast("double") / col("npos"), 6).as("recall"),
        col("auc"))
      .withColumn("f1", round(lit(2.0) * col("precision") * col("recall") /
        nullif(col("precision") + col("recall"), lit(0.0)), 6))
      .select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"),
        col("precision"), col("recall"), col("f1"), col("auc"))
      .orderBy(col("thr"))
  }

  /** Reliability table + expected calibration error of the trained
    * model on its training set — the audit that makes the sigmoid SCORES
    * (not just the ranking evalSweep validates) trustworthy as selection
    * weights: per decile bin of predicted probability, does the empirical
    * positive rate match the mean prediction? ECE = Σ_b (n_b/N)·|acc_b −
    * conf_b| (Naeini et al. AAAI'15 / Guo et al. ICML'17's standard
    * form). One corpus pass into a ≤10-row bin table; acc/conf are
    * single IEEE divisions of exact aggregates (counts; the confidence
    * numerator is an exact DECIMAL(18,8) sum of the 8dp scores); the ECE
    * total floor-8s each bin gap onto the 1e-8 grid, scales by the exact
    * bin count through a DECIMAL(12,0) cast (invariant 12 — a BIGINT
    * multiply would silently clip the scale), sums exactly, and divides
    * once. Bin index floor(s·10) is an exact integral double, so
    * DuckDB's round-to-nearest double→int cast and Spark's truncation
    * agree. Returns (bin, n, npos, acc, conf, ece). */
  def calibration(feat0: DataFrame, iters: Int = 5, lr: Double = 2.0,
                  trained: Option[DataFrame] = None): DataFrame = {
    val feat = feat0.localCheckpoint()
    val w = trained.getOrElse(weightsFrame(feat, iters, lr))
    def f(c: Column, k: Int) = {
      val p = math.pow(10, k)
      floor(c * lit(p) + lit(0.5)) / lit(p)
    }
    val agg = feat.crossJoin(broadcast(w))
      .select(scoreExpr.as("s"), col("y"))
      .select(least(floor(col("s") * 10), lit(9L)).cast("int").as("bin"),
        col("s"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("npos"),
        sum(col("s").cast(DecimalType(18, 8))).as("ssum"))
      .localCheckpoint()
    val acc = col("npos").cast("double") / col("n")
    val conf = col("ssum").cast("double") / col("n")
    val ece = agg
      .select((f(abs(acc - conf), 8).cast(DecimalType(18, 8)) *
        col("n").cast(DecimalType(12, 0))).as("t"), col("n"))
      .agg(sum(col("t")).as("tsum"), sum(col("n")).as("nn"))
      .select(f(col("tsum").cast("double") / col("nn"), 6).as("ece"))
    agg.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("npos"),
        f(acc, 6).as("acc"), f(conf, 6).as("conf"), col("ece"))
      .orderBy(col("bin"))
  }

  /** Token-weighted yield curve of the trained quality filter — the
    * production knob a filtering pipeline actually reports: for each
    * threshold t ∈ {0.1 … 0.9}, KEEP documents whose junk score s < t and
    * publish how much of the corpus survives (docs and tokens) and how
    * much planted junk leaks through. `feat` must carry (y, ntoks,
    * x1..x3); same one-pass-to-distinct-score-groups shape as
    * [[evalSweep]], so corpus cost is one scan + one bounded aggregate.
    * Returns (thr, kept_docs, kept_tokens, kept_token_share,
    * bad_leak_rate), ordered by thr. */
  def yieldCurve(feat0: DataFrame, iters: Int = 5, lr: Double = 2.0,
                 trained: Option[DataFrame] = None): DataFrame = {
    val feat = feat0.localCheckpoint()
    val w = trained.getOrElse(weightsFrame(feat, iters, lr))
    val groups = feat.crossJoin(broadcast(w))
      .select(scoreExpr.as("s"), col("y"), col("ntoks"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("nbad"),
        sum(col("ntoks")).as("tok"))
      .localCheckpoint()
    val tot = groups.agg(sum(col("nbad")).as("npos"),
      sum(col("tok")).as("toktot"))
    val thr = feat.sparkSession.range(1)
      .select(explode(sequence(lit(1), lit(9))).as("k"))
      .select((col("k") / 10.0).as("thr"))
    thr.crossJoin(groups)
      .groupBy(col("thr"))
      .agg(coalesce(sum(when(col("s") < col("thr"), col("n"))), lit(0L))
          .as("kept_docs"),
        coalesce(sum(when(col("s") < col("thr"), col("tok"))), lit(0L))
          .as("kept_tokens"),
        coalesce(sum(when(col("s") < col("thr"), col("nbad"))), lit(0L))
          .as("bad_kept"))
      .crossJoin(broadcast(tot))
      .select(col("thr"), col("kept_docs"), col("kept_tokens"),
        round(col("kept_tokens").cast("double") / col("toktot"), 6)
          .as("kept_token_share"),
        round(col("bad_kept").cast("double") / col("npos"), 6)
          .as("bad_leak_rate"))
      .orderBy(col("thr"))
  }

  /** The junk suffix the declared query plants to build its positive
    * class: 20 letter-free tokens — the degenerate-document shape (number
    * spam, symbol boilerplate) a production quality filter exists to
    * remove. */
  val junkSuffix: String = " " + Seq.fill(20)("9#").mkString(" ")

  /** The declared-query feature map: the corpus unioned with planted
    * degenerate copies (each doc re-appears junk-suffixed under
    * id+200000, label 1; originals label 0 — a balanced, SEPARABLE
    * training set, the same planting discipline the dedup queries use),
    * and surface statistics as features — distinct-stopword coverage,
    * mean token length (/10), ASCII-letter ratio. All round-6 BEFORE
    * training. */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val enStop = TextAnalysis.stopwords.toMap.apply("en")
    val corpus = docs.select(col("text"), lit(0.0).as("y")).unionByName(
      docs.select(concat(col("text"), lit(junkSuffix)).as("text"),
        lit(1.0).as("y")))
    val toks = TextOps.tokens(col("text"))
    TextOps.spread(corpus)
      .select(col("y"), col("text"), toks.as("toks"))
      .filter(size(col("toks")) > 0 && length(col("text")) > 0)
      .select(
        col("y"),
        // token count rides along for token-weighted reporting
        // (yieldCurve); training/eval consumers ignore it
        size(col("toks")).cast("long").as("ntoks"),
        round(size(array_intersect(array_distinct(col("toks")),
            lit(enStop.toArray))).cast("double") /
          size(array_distinct(col("toks"))), 6).as("x1"),
        round(aggregate(col("toks"), lit(0L), (a, t) => a + length(t))
          .cast("double") / size(col("toks")) / 10.0, 6).as("x2"),
        // 10× the non-letter fraction: exactly 0 on clean fixture text, so
        // the planted class is separable within the fixed iteration budget
        round((length(col("text")) -
            length(regexp_replace(col("text"), "[^a-zA-Z ]", ""))) * 10.0 /
          length(col("text")), 6).as("x3"))
  }
}
