package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trainable unigram-LM (SentencePiece-style) tokenizer — the other half
  * of the tokenizer family beside [[Bpe]]: most modern LLM tokenizers fit
  * a unigram piece model (Kudo ACL'18), not merge rules. BPE grows pieces
  * bottom-up greedily; the unigram model starts from a LARGE candidate
  * piece pool and lets expectation-maximization keep the pieces a minimal
  * segmentation actually uses.
  *
  * This is the deterministic HARD-EM (Viterbi-EM) variant, chosen so
  * every quantity is an exact integer and the DuckDB oracle can replay
  * training verbatim:
  *   - candidates: every word-internal substring of length ≤ [[MaxK]],
  *     counted with exact integer word-frequency weights; the pool keeps
  *     all single chars (coverage guarantee) + the top-`pool` multi-char
  *     pieces (count desc, piece asc tie-break);
  *   - piece costs: −ln(count/total) floor-rounded at 8dp and SCALED TO
  *     AN INTEGER (cost_e8 = ⌊−ln(p)·1e8 + 0.5⌋ as BIGINT) — the one
  *     libm call per piece (invariant 10), after which the whole DP is
  *     BIGINT arithmetic, bit-portable by construction;
  *   - E-step: per-word Viterbi segmentation by a FIXED-depth unrolled
  *     DP over positions 1..[[MaxLen]] (d_j = min over k ≤ MaxK of
  *     d_{j−k} + cost(w[j−k..j]); ties prefer the SMALLEST k), words
  *     longer than MaxLen fall back to per-character pieces;
  *   - M-step: usage counts from the Viterbi segmentations (exact
  *     integers), pruned to chars + top-`budget` multi-char pieces
  *     (usage desc, piece asc), add-one smoothed costs;
  *   - one E-M round then a final E-step under the trained costs.
  * Same corpus ⇒ identical pieces, costs, and segmentations at any
  * partitioning.
  *
  * Scale shape: everything after the initial word count runs on the
  * DISTINCT-WORD vocabulary (corpus-size-independent, the [[Bpe]]
  * property); the piece table rides as a broadcast 1-row map and the DP
  * is a fixed-width column pipeline — no per-word loop, no shuffle
  * beyond the vocabulary aggregations. Applying the tokenizer is one
  * broadcast join of corpus tokens against the |vocab|-row segmentation
  * table. */
object UnigramLm {

  /** Cost of a piece absent from the trained pool (1e15 — larger than
    * any MaxLen · max-cost path, so absent pieces never win). */
  val Big = 1000000000000000L
  /** Maximum candidate piece length. */
  val MaxK = 4
  /** Unrolled DP depth; longer words segment as single chars. */
  val MaxLen = 10

  /** Per-character spaced fallback segmentation (the [[Bpe]] charState
    * rule, without the outer pad). */
  private def charSeg(w: Column): Column =
    trim(regexp_replace(w, "(.)", "$1 "))

  /** Fixed-depth Viterbi over a frame carrying (w) + the broadcast piece
    * map `pm` (piece → integer cost_e8). Adds a trimmed spaced `seg`
    * column holding the min-cost segmentation (smallest-k tie-break). */
  private def viterbiSeg(frame: DataFrame): DataFrame = {
    def lk(p: Column) = coalesce(element_at(col("pm"), p), lit(Big))
    var df = frame.withColumn("d0", lit(0L)).withColumn("seg0", lit(""))
    for (j <- 1 to MaxLen) {
      val cands = (1 to math.min(MaxK, j)).map { k =>
        val piece = substring(col("w"), j - k + 1, k)
        (col(s"d${j - k}") + lk(piece),
          concat(col(s"seg${j - k}"), lit(" "), piece))
      }
      def pick(rest: List[(Column, Column)]): Column = rest match {
        case (_, s) :: Nil => s
        case (c, s) :: tl =>
          when(tl.map(t => c <= t._1).reduce(_ && _), s).otherwise(pick(tl))
        case Nil => throw new IllegalStateException("no candidates")
      }
      df = df.withColumn(s"d$j", cands.map(_._1).reduce(least(_, _)))
        .withColumn(s"seg$j", pick(cands.toList))
    }
    val segFinal = (1 to MaxLen).foldLeft(charSeg(col("w"))) { (acc, j) =>
      when(length(col("w")) === j, col(s"seg$j")).otherwise(acc)
    }
    df.withColumn("seg", trim(segFinal))
  }

  private def pieceMap(pieces: DataFrame): DataFrame =
    pieces.agg(map_from_entries(
      collect_list(struct(col("piece"), col("cost_e8")))).as("pm"))

  private def intCost(ratioNum: Column, tot: Column): Column =
    floor((-log(ratioNum.cast("double") / tot)) * 1e8 + lit(0.5))
      .cast("long")

  /** Train over the whitespace-token vocabulary of `docs(textCol)`.
    * Returns (pieces, perWord):
    * pieces  = (piece, usage, cost_e8) — the final trained piece table
    *           (usage 0 for never-used coverage chars; add-one smoothed
    *           costs);
    * perWord = (w, cnt, seg) — every distinct word with its final
    *           Viterbi segmentation (spaced string). */
  def train(docs: DataFrame, textCol: String, pool: Int = 16,
            budget: Int = 8): (DataFrame, DataFrame) = {
    val v0 = TextOps.spread(docs)
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val subs = v0
      .select(col("w"), col("cnt"),
        explode(expr("sequence(0, length(w) - 1)")).as("s"))
      .select(col("w"), col("cnt"), col("s"),
        explode(expr(s"sequence(1, $MaxK)")).as("k"))
      .filter(col("s") + col("k") <= length(col("w")))
      .select(col("cnt"), expr("substring(w, s + 1, k)").as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("c"))
      .localCheckpoint()
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("c").desc, col("piece"))))
      .filter(col("rn") <= pool).drop("rn")
    val kept0 = chars.unionByName(multi)
    val cost0 = kept0
      .crossJoin(broadcast(kept0.agg(sum(col("c")).as("tot"))))
      .select(col("piece"), intCost(col("c"), col("tot")).as("cost_e8"))
    val seg1 = viterbiSeg(v0.crossJoin(broadcast(pieceMap(cost0))))
      .select(col("cnt"), explode(split(col("seg"), " ")).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("uc"))
      .localCheckpoint()
    val chars1 = chars.select(col("piece"))
      .join(seg1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("uc"), lit(0L)).as("uc"))
    val multi1 = seg1.filter(length(col("piece")) > 1)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("uc").desc, col("piece"))))
      .filter(col("rn") <= budget).drop("rn")
    val kept1 = chars1.unionByName(multi1)
    val pieces = kept1
      .crossJoin(broadcast(kept1.agg(sum(col("uc") + 1).as("tot"))))
      .select(col("piece"), col("uc").as("usage"),
        intCost(col("uc") + 1, col("tot")).as("cost_e8"))
      .localCheckpoint()
    val perWord = viterbiSeg(v0.crossJoin(broadcast(pieceMap(
        pieces.select(col("piece"), col("cost_e8"))))))
      .select(col("w"), col("cnt"), col("seg"))
      .localCheckpoint()
    (pieces, perWord)
  }

  /** Per-doc whitespace-vs-unigram token counts under a trained
    * segmentation table: (doc_id, ws_tokens, uni_tokens). One broadcast
    * join of exploded corpus tokens against the |vocab|-row table —
    * linear in corpus tokens; words absent from the vocabulary fall
    * back to per-character pieces. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  perWord: DataFrame): DataFrame = {
    val np = perWord.select(col("w"),
      size(split(col("seg"), " ")).as("np"))
    TextOps.spread(docs)
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("w"))
      .join(broadcast(np), Seq("w"), "left")
      .withColumn("np", coalesce(col("np"), length(col("w"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ws_tokens"), sum(col("np")).as("uni_tokens"))
  }
}
