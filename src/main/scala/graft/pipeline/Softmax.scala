package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.graph.NodeEmbedding.pround

/** Deterministic multi-class softmax regression by full-batch gradient
  * descent — the domain-tagging stage of a training-data pipeline
  * (fastText-style source/domain classifiers feeding mixture weighting à
  * la DoReMi): learn a K-class linear model from corpus features INSIDE
  * the engine, so the domain tags are versioned with the data they were
  * fit on.
  *
  * Float discipline follows [[Classifier]] (the proven logistic recipe)
  * upgraded to invariant 12's floor-idiom rounding for every step of the
  * iterative replay:
  *   - features arrive floor-round-6;
  *   - per class k: margin z_k floor-rounds to 8dp, e_k = exp(z_k)
  *     floor-rounds to 8dp (the one libm call, invariant 10), and
  *     p_k = e_k / Σe floor-rounds to 8dp — the Σ is spelled as a fixed
  *     left-associated chain in class order on both engines;
  *   - per-(class, feature) gradient sums run in DECIMAL(20,10)
  *     (order-independent at any partitioning), divide by n as a double
  *     floor-round-8, weight updates floor-round-6; iteration count
  *     FIXED, weights seeded 0.
  * Same input ⇒ bit-identical weights on any cluster layout, so a DuckDB
  * oracle replays every iteration as unrolled CTEs.
  *
  * Scale shape per iteration: ONE pass over the feature table (the 1-row
  * weight vector is a broadcast crossJoin) into a partial+final aggregate
  * of K·(d+1) decimal sums — softmax GD at 100 TB is exactly as
  * expensive as K·(d+1) distributed sums per step, nothing else.
  */
object Softmax {

  /** Weight-column name for class k, feature j (j = 0 is the bias). */
  def wcol(k: String, j: Int): String = s"w_${k}_$j"

  /** Floor-round-8 class margin z_k = w_k0 + Σ_j w_kj·x_j over a frame
    * carrying the weight row (crossJoined broadcast) and x1..xd. */
  private def z(k: String, d: Int): Column =
    pround((1 to d).foldLeft(col(wcol(k, 0))) { (acc, j) =>
      acc + col(wcol(k, j)) * col(s"x$j")
    }, 8)

  /** Per-class floor-round-8 softmax probabilities, in class order. The
    * exp normalizer sums the round-8 e_k in FIXED class order (left
    * associated) so both engines add the same doubles in the same
    * sequence. */
  def probs(classes: Seq[String], d: Int): Seq[(String, Column)] = {
    val es = classes.map(k => k -> pround(exp(z(k, d)), 8))
    val s = es.map(_._2).reduce(_ + _)
    es.map { case (k, e) => k -> pround(e / s, 8) }
  }

  /** Argmax class with first-in-class-order tie-break (the
    * [[TextAnalysis.predLangColFrom]] convention). */
  def predCol(classes: Seq[String], d: Int): Column = {
    val ps = probs(classes, d)
    def chain(rest: List[(String, Column)]): Column = rest match {
      case (k, _) :: Nil => lit(k)
      case (k, p) :: tl =>
        when(tl.map(t => p >= t._2).reduce(_ && _), k).otherwise(chain(tl))
      case Nil => throw new IllegalArgumentException("no classes")
    }
    chain(ps.toList)
  }

  private def step(feat: DataFrame, w: DataFrame, classes: Seq[String],
                   d: Int, lr: Double): DataFrame = {
    def dec(c: Column) = c.cast(DecimalType(20, 10))
    val dks = probs(classes, d).map { case (k, p) =>
      k -> (p - when(col("y") === k, 1.0).otherwise(0.0))
    }
    val aggs = (for ((k, dk) <- dks; j <- 0 to d) yield {
      val xj = if (j == 0) lit(1.0) else col(s"x$j")
      sum(dec(pround(dk * xj, 8))).as(s"s_${k}_$j")
    }) :+ count(lit(1)).as("n")
    val g = feat.crossJoin(broadcast(w)).agg(aggs.head, aggs.tail: _*)
    val upd = for (k <- classes; j <- 0 to d) yield
      pround(col(wcol(k, j)) - lit(lr) *
        pround(col(s"s_${k}_$j").cast("double") / col("n"), 8), 6)
        .as(wcol(k, j))
    w.crossJoin(broadcast(g)).select(upd: _*).localCheckpoint()
  }

  /** The 1-row trained weight frame (w_<class>_<j> for every class and
    * j ∈ 0..d) after `iters` fixed GD steps from a zero start. `feat`
    * must carry y (class string) and x1..xd (floor-round-6 doubles). */
  def train(feat0: DataFrame, classes: Seq[String], d: Int,
            iters: Int, lr: Double): DataFrame = {
    val feat = feat0.localCheckpoint()
    val s = feat.sparkSession
    var w = s.range(1).select(
      (for (k <- classes; j <- 0 to d) yield lit(0.0).as(wcol(k, j))): _*)
    for (_ <- 1 to iters) w = step(feat, w, classes, d, lr)
    w.localCheckpoint()
  }
}
