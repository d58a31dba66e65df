package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-adaptive blocking for similarity/linkage joins — the operator
  * that ACTS on the blocking audit (reduction ratio vs pair
  * completeness, q_link_blocking_eval) instead of just measuring it.
  *
  * The round-8 lesson: a CONSTANT-entropy block key (fixed 6-char
  * prefix) has block sizes that grow linearly with the corpus, so
  * candidate pairs grow quadratically — measured 23.7M candidates /
  * 3.6× wall at 10× rows for q_link_jw. Constant-cap PURGING (drop hot
  * blocks) restores linearity but destroys recall on exactly the pairs
  * that live in template-heavy blocks (measured: 26/40 planted twins
  * at cap 32 on sf1). The fix is **entropy escalation by partition
  * refinement**: an ordered ladder of keys, coarse → fine (e.g.
  * 8-/14-/20-char prefixes); every row is assigned the COARSEST key
  * whose block is within `cap`, and rows in over-cap blocks escalate
  * to the next, higher-entropy key. Hot blocks split; cold blocks
  * keep their cheap coarse key.
  *
  * Why completeness survives refinement but not purging: the
  * escalation decision is a function of the BLOCK, not the row — two
  * rows that agree on every ladder key have identical block counts at
  * every level, so they escalate together and land in the same final
  * block. Any true pair that agrees on the full ladder is therefore
  * recalled with NO cap tuning (40/40 planted twins at sf0.01/sf0.1/
  * sf1, measured), while purging has no such guarantee. Pairs that
  * disagree on a fine key but agreed on the coarse one are the
  * candidates escalation spends — the standard blocking-policy trade,
  * now paid only inside hot blocks.
  *
  * The 100 TB shape: L groupBy histograms + L equi-joins on the key
  * (no window over the corpus), then one self-join per final block.
  * Candidate volume is Σ c² with c ≤ cap everywhere except the final
  * level, whose blocks are the irreducible "agree on the entire
  * ladder" families — at sf1 the measured volume is 327k vs 23.7M for
  * the constant key (73×). If the finest key still leaves hot blocks,
  * the next escalation is a NEW FIELD (multi-key meta-blocking), not a
  * longer prefix — that is [[assignMeta]]/[[candidatesMeta]]: blocks
  * still hot after the whole ladder re-block under a second,
  * independent key family (which must itself be twin-preserving for
  * the linkage at hand — same contract as the ladder keys).
  */
object Blocking {

  /** Assign each row its escalated block key: the first (coarsest) key
    * in `ladder` whose block size is ≤ `cap`, else the last key
    * unconditionally (never purge — the final level is the recall
    * floor). Returns `df` + a `blk` string column, level-prefixed so
    * blocks from different levels can never collide. */
  def assign(df: DataFrame, ladder: Seq[Column], cap: Int): DataFrame = {
    require(ladder.nonEmpty, "need at least one block key")
    // NULL ladder keys coalesce to a sentinel BEFORE the histogram joins:
    // the per-level counts attach via inner equi-join on _bk$i, and
    // NULL never equals NULL — without the sentinel, null-keyed rows
    // silently vanish from candidates() and undercount audit()'s n_docs.
    // The NUL-prefixed sentinel cannot collide with real key text.
    val keyed = ladder.zipWithIndex.foldLeft(df) { case (d, (k, i)) =>
      d.withColumn(s"_bk$i", coalesce(k.cast("string"), lit("\u0000null")))
    }
    // One histogram + equi-join per level: no corpus-wide window, every
    // step an aggregated (≤ one row per block) build side.
    val counted = ladder.indices.foldLeft(keyed) { (d, i) =>
      val hist = keyed.groupBy(col(s"_bk$i")).agg(count(lit(1)).as(s"_bc$i"))
      d.join(hist, s"_bk$i")
    }
    val last = ladder.size - 1
    val blk = ladder.indices.init.foldRight(
      concat(lit(s"L$last:"), col(s"_bk$last"))) { (i, fine) =>
      when(col(s"_bc$i") <= cap, concat(lit(s"L$i:"), col(s"_bk$i")))
        .otherwise(fine)
    }
    counted.withColumn("blk", blk)
      .drop(ladder.indices.flatMap(i => Seq(s"_bk$i", s"_bc$i")): _*)
  }

  /** Multi-key meta-blocking (the ladder's documented next escalation,
    * for blocks still hot after the FULL ladder — irreducible
    * same-whole-ladder families, e.g. boilerplate-prefixed crawl pages
    * when the ladder is prefix-based): rows whose final ladder block
    * exceeds `cap` are re-blocked by a SECOND, independent key family
    * (`altLadder` — a different FIELD or axis, e.g. suffix keys against
    * a prefix ladder; it must be twin-preserving for the linkage at
    * hand, same contract as the primary ladder). Everyone else keeps
    * their ladder block.
    *
    * The result is still a PARTITION — each row lands in exactly one
    * block (hot rows' `M:` namespace cannot collide with ladder
    * levels), so pair generation needs no cross-family dedup and the
    * audit stays pair-free. Recall vs the plain ladder: cold-block
    * pairs are identical; hot-block pairs trade the ladder's
    * quadratic within-block c² for family-2 agreement — a true pair
    * in a hot family is recalled iff it agrees on the alt family at
    * the level it escalates to, which holds whenever the corruption
    * the linkage tolerates does not touch the alt key (the planted
    * template fixture in q_link_meta pins this at completeness 1.0).
    * Rows from DIFFERENT hot blocks that share an alt key also become
    * candidates — the independent family adds that recall for free. */
  def assignMeta(df: DataFrame, ladder: Seq[Column], altLadder: Seq[Column],
                 cap: Int): DataFrame = {
    val a = assign(df, ladder, cap)
    val hist = a.groupBy(col("blk")).agg(count(lit(1)).as("_fbc"))
    val withC = a.join(hist, "blk")
    val cold = withC.filter(col("_fbc") <= cap).drop("_fbc")
    val hot = withC.filter(col("_fbc") > cap).drop("_fbc", "blk")
    val hotMeta = assign(hot, altLadder, cap)
      .withColumn("blk", concat(lit("M:"), col("blk")))
    cold.unionByName(hotMeta)
  }

  /** All unordered candidate pairs (a < b) sharing an escalated block.
    * Each row holds exactly ONE final block, so every pair is emitted
    * at most once — no distinct needed. Extra columns of `df` travel
    * through as `<col>_a` / `<col>_b` for the verifier. */
  def candidates(df: DataFrame, idCol: String, ladder: Seq[Column],
                 cap: Int): DataFrame =
    pairsOf(assign(df, ladder, cap), idCol,
      df.columns.filter(_ != idCol).toSeq)

  /** Candidate pairs under the meta policy ([[assignMeta]]). */
  def candidatesMeta(df: DataFrame, idCol: String, ladder: Seq[Column],
                     altLadder: Seq[Column], cap: Int): DataFrame =
    pairsOf(assignMeta(df, ladder, altLadder, cap), idCol,
      df.columns.filter(_ != idCol).toSeq)

  private def pairsOf(assigned: DataFrame, idCol: String,
                      others: Seq[String]): DataFrame = {
    def side(s: String) = assigned.select(
      (col(idCol).as(s"${s}_id") +: col("blk") +:
        others.map(c => col(c).as(s"${c}_$s"))): _*)
    side("a").join(side("b"), "blk")
      .filter(col("a_id") < col("b_id"))
      .drop("blk")
  }

  /** Blocking-policy audit over the escalated key, pair-free (the
    * q_link_blocking_eval numbers): block count, max block, candidate
    * pairs from the size histogram. Counting in DECIMAL(38,0) — Σ c²
    * at 100 TB overflows int64. */
  def audit(df: DataFrame, ladder: Seq[Column], cap: Int): DataFrame =
    auditOf(assign(df, ladder, cap))

  /** Pair-free audit of the meta policy — valid because [[assignMeta]]
    * is still a partition. */
  def auditMeta(df: DataFrame, ladder: Seq[Column], altLadder: Seq[Column],
                cap: Int): DataFrame =
    auditOf(assignMeta(df, ladder, altLadder, cap))

  private def auditOf(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("blk")).agg(count(lit(1)).cast("decimal(38,0)").as("c"))
      .agg(
        sum(col("c")).cast("bigint").as("n_docs"),
        count(lit(1)).as("n_blocks"),
        max(col("c")).cast("bigint").as("max_block"),
        sum(col("c") * (col("c") - 1) / 2).cast("bigint").as("cand_pairs"))
}
