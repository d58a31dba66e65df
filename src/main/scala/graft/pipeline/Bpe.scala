package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable byte-pair-encoding tokenizer — the step that makes token
  * budgets (sequence packing, mixture weights) REAL numbers instead of
  * whitespace proxies.
  *
  * Training is classic BPE restricted to word-internal merges: start from
  * per-character pieces, repeatedly count adjacent piece pairs over the
  * (distinct-word, count)-weighted vocabulary and merge the single most
  * frequent pair everywhere. Deterministic end to end: integer pair
  * counts, ties broken by pair string ascending, FIXED merge count — the
  * same corpus yields the same merge table at any partitioning, which is
  * what lets a DuckDB oracle replay training as unrolled CTEs.
  *
  * Piece state is a single spaced string (" c h a r s ") and a merge is
  * one literal `replace(state, " a b ", " ab ")` — both engines scan
  * left-to-right without rescanning replaced text, so greedy-merge
  * semantics (the "aaa" overlap case) agree by construction.
  *
  * Scale shape per merge: one adjacent-pair explode + count over the
  * DISTINCT-WORD vocabulary (corpus-size-independent after the initial
  * word count), a 1-row top-1 broadcast, one narrow map. The vocabulary is
  * localCheckpointed per step so lineage stays flat over iterations.
  * Applying the tokenizer is a broadcast join of corpus tokens against the
  * trained vocab — one narrow pass at any corpus size.
  */
object Bpe {

  /** Initial per-character state of a word: " c h a r s ". */
  private def charState(w: org.apache.spark.sql.Column) =
    concat(lit(" "), trim(regexp_replace(w, "(.)", "$1 ")), lit(" "))

  /** Learn `numMerges` merges over the whitespace-token vocabulary of
    * `docs(textCol)`. Returns (merges, vocab):
    * merges = (step, pair, c) — the merge table in training order;
    * vocab  = (w, cnt, state) — every distinct word with its final piece
    * state (spaced string). */
  def train(docs: DataFrame, textCol: String,
            numMerges: Int): (DataFrame, DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var vocab = TextOps.spread(docs)
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("state", charState(col("w")))
      .localCheckpoint()
    var merges = Vector.empty[DataFrame]
    var step = 1
    while (step <= numMerges) {
      val ps = split(trim(col("state")), " ")
      val pairs = vocab.select(col("cnt"),
        explode(zip_with(
          slice(ps, lit(1), size(ps) - 1),
          slice(ps, lit(2), size(ps) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
      val top = pairs.groupBy(col("pair")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .localCheckpoint()
      if (top.isEmpty) { step = numMerges + 1 } // fully merged corpus
      else {
        merges = merges :+ top.select(lit(step).as("step"), col("pair"), col("c"))
        vocab = vocab.crossJoin(broadcast(top.select(col("pair").as("mp"))))
          .withColumn("state", replace(col("state"),
            concat(lit(" "), col("mp"), lit(" ")),
            concat(lit(" "), replace(col("mp"), lit(" "), lit("")), lit(" "))))
          .drop("mp")
          .localCheckpoint()
        step += 1
      }
    }
    // a corpus can fully merge before numMerges (every word one piece —
    // no adjacent pairs left): return an EMPTY merge table of the right
    // schema instead of throwing on the empty reduce
    val mergesDf =
      if (merges.isEmpty)
        docs.sparkSession.range(0)
          .select(lit(1).as("step"), lit("").as("pair"), lit(0L).as("c"))
      else merges.reduce(_ unionByName _)
    (mergesDf, vocab)
  }

  /** Per-doc whitespace-vs-BPE token counts under a trained vocab:
    * (doc_id, ws_tokens, bpe_tokens). The apply path is ONE broadcast
    * join of exploded corpus tokens against the |vocab|-row piece-count
    * table — linear in corpus tokens. Words absent from the vocab (apply
    * corpus ≠ train corpus) fall back to per-character pieces via the
    * same charState rule. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  vocab: DataFrame): DataFrame = {
    val np = vocab.select(col("w"),
      size(split(trim(col("state")), " ")).as("np"))
    TextOps.spread(docs)
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("w"))
      .join(broadcast(np), Seq("w"), "left")
      .withColumn("np", coalesce(col("np"),
        size(split(trim(charState(col("w"))), " "))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ws_tokens"), sum(col("np")).as("bpe_tokens"))
  }
}
