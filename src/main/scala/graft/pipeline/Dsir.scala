package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR-style data selection via importance resampling (Xie et al.
  * NeurIPS'23, "Data Selection for Language Models via Importance
  * Resampling"): score every raw-pool document by how much more likely
  * its hashed n-gram bag is under the TARGET domain's bag-of-ngrams model
  * than under the raw pool's, then resample with Gumbel-perturbed top-k.
  *
  * Everything is deterministic and oracle-replayable:
  *   - features are unigrams + word bigrams hashed into `buckets` buckets
  *     with the portable md5 bucket hash ([[TextOps.strHash]] — the
  *     q_sample_weighted precedent), never an engine hash;
  *   - both bag models are add-one smoothed; each log-probability is ONE
  *     libm ln floor-rounded at 8dp (invariant 10) and cast to
  *     DECIMAL(12,8), so the per-bucket log-ratio λ_b is decimal-exact;
  *   - a document's log importance weight Σ_b c_b·λ_b multiplies the
  *     integer counts as DECIMAL(12,0) (invariant 12 — no silent scale
  *     reduction) and sums in decimal: order-independent, bit-identical
  *     at any partitioning.
  *
  * Scale shape: one corpus-linear explode + one (doc, bucket) aggregation;
  * the two model tables are ≤`buckets` rows and ride as broadcasts; no
  * global window anywhere — selection is TakeOrdered downstream. */
object Dsir {

  /** Per-document log importance weight as an exact decimal `lw`
    * (DECIMAL(36,8)) alongside the passthrough columns in `keep`.
    * `isTarget` marks the documents that define the target distribution
    * (they are still scored — at fixture scale the raw pool is the whole
    * corpus, matching the paper's setup where raw ⊇ target lookalikes). */
  def logWeights(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, keep: Seq[String] = Nil,
                 buckets: Int = 256): DataFrame = {
    val pr8 = (c: Column) => graft.graph.NodeEmbedding.pround(c, 8)
    val base = TextOps.spread(docs)
      .select(col(idCol) +: isTarget.as("__t") +: keep.map(col) :+
        TextOps.tokens(col(textCol)).as("__toks"): _*)
    val grams = base
      .select(col(idCol) +: col("__t") +: keep.map(col) :+
        explode(concat(col("__toks"), TextOps.kgrams(col("__toks"), 2)))
          .as("g"): _*)
    // r14-opt: feats feeds THREE consumers (target counts tc, raw counts
    // rc, and the final per-doc weight join) whose subtrees canonicalize
    // differently (tc's __t filter pushes below the aggregate), so
    // without a materialization the tokenizer+bigram explode and the
    // per-occurrence md5 bucket hash — the dominant corpus-linear cost —
    // execute three times (q_mix_dsir measured 2.56 → 1.45 s warm at
    // sf0.1). A production DSIR run materializes the featurized corpus
    // once for the same reason.
    val feats = grams
      .withColumn("b",
        (TextOps.strHash(concat(lit("dsir:"), col("g"))) % buckets)
          .cast("int"))
      .groupBy(col(idCol) +: col("__t") +: keep.map(col) :+ col("b"): _*)
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tc = feats.filter(col("__t"))
      .groupBy(col("b")).agg(sum(col("c")).as("ct"))
    val rc = feats.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val tot = tc.agg(sum(col("ct")).as("t"))
      .crossJoin(rc.agg(sum(col("cr")).as("r")))
    val lam = rc.join(tc, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        (pr8(log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("t") + buckets))).cast(DecimalType(12, 8)) -
          pr8(log((col("cr") + 1).cast("double") / (col("r") + buckets)))
            .cast(DecimalType(12, 8))).as("lam"))
    feats.join(broadcast(lam), "b")
      .groupBy(col(idCol) +: keep.map(col): _*)
      .agg(sum(col("c").cast(DecimalType(12, 0)) * col("lam")).as("lw"))
  }
}
