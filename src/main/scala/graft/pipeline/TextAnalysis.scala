package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data curation: language ID, quality
  * scoring, token counting, document fingerprinting. All pure column
  * algebra (codegen'd, no UDFs) — one narrow pass over the corpus. */
object TextAnalysis {
  import TextOps._

  /** Tiny fixed stopword lists per language — the n-gram-heuristic core of
    * fasttext-style langid, engine-portable. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une", "dans"))

  /** Column kernel: argmax language prediction over distinct-stopword hit
    * counts (tie-break: list order en > de > es > fr). Pure expression —
    * composable into any projection without a join. `dtoks` is the
    * DISTINCT token array — callers holding a pre-tokenized column pass
    * it here and skip the regex re-split. */
  def predLangColFrom(dtoks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val Seq(en, de, es, fr) = stopwords.map { case (_, words) =>
      size(array_intersect(dtoks, typedlit(words)))
    }
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  def predLangCol(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    predLangColFrom(array_distinct(tokens(textCol)))

  /** Non-punctuation charset of the quality kernel: n_punct counts chars
    * of the LOWERCASED text outside [a-z0-9 ]. Implemented with
    * `translate` (delete-these-chars), not `regexp_replace`: identical
    * values (same charset, lower() preserves string length), but a plain
    * char-map pass instead of the regex engine — measured 10× on the
    * punctuation count, the quality family's dominant row kernel. */
  private val NonPunct = ('a' to 'z').mkString + ('0' to '9').mkString + " "

  /** n_punct from a text column: delete every [a-z0-9 ] char of the
    * lowercased text — what remains IS the punctuation, count it. */
  def punctCountCol(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    length(translate(lower(textCol), NonPunct, ""))

  /** Column kernel: the heuristic quality score (stopword / length /
    * punctuation ratios), rounded to 6dp, from a pre-tokenized column. */
  def qualityColFrom(toks: org.apache.spark.sql.Column,
                     textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val allStop = typedlit(stopwords.flatMap(_._2))
    val nTokens = size(toks)
    val nChars = length(textCol)
    val nPunct = punctCountCol(textCol)
    val nStop = size(array_intersect(array_distinct(toks), allStop))
    round(
      lit(0.4) * (nStop / greatest(nTokens, lit(1)).cast("double")) +
        lit(0.3) * least(nTokens / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - nPunct / greatest(nChars, lit(1)).cast("double")), 6)
  }

  def qualityCol(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    qualityColFrom(tokens(textCol), textCol)

  /** Distinct-stopword hit counts per language + argmax prediction
    * (tie-break: list order en > de > es > fr), from a pre-tokenized
    * column — the [[TextOps]] token-table sharing shape. */
  def languageIdFrom(docs: DataFrame, idCol: String,
                     toksCol: org.apache.spark.sql.Column): DataFrame = {
    val dtoks = array_distinct(toksCol)
    docs.select(
      (col(idCol).as("doc_id") +:
        stopwords.map { case (lang, words) =>
          size(array_intersect(dtoks, typedlit(words))).as(s"hits_$lang")
        }) :+ predLangColFrom(dtoks).as("pred_lang"): _*)
  }

  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    languageIdFrom(docs, idCol, tokens(col(textCol)))

  /** Heuristic quality score from length / punctuation / stopword ratios
    * (the usual pre-training corpus filters), from a pre-tokenized
    * column. */
  def qualityScoreFrom(docs: DataFrame, idCol: String,
                       toksCol: org.apache.spark.sql.Column,
                       textCol: org.apache.spark.sql.Column): DataFrame = {
    val allStop = typedlit(stopwords.flatMap(_._2))
    // quality recomputed from the PROJECTED counts, not qualityColFrom:
    // the punctuation-count pass is the row kernel's dominant cost and
    // must run once per row, not once per consuming expression
    // (identical arithmetic — the score is a pure function of the four
    // counts either way, so hashes are unchanged)
    docs.select(
      col(idCol).as("doc_id"),
      size(toksCol).as("n_tokens"),
      length(textCol).as("n_chars"),
      punctCountCol(textCol).as("n_punct"),
      size(array_intersect(array_distinct(toksCol), allStop)).as("n_stop"))
      .withColumn("quality", round(
        lit(0.4) * (col("n_stop") / greatest(col("n_tokens"), lit(1)).cast("double")) +
          lit(0.3) * least(col("n_tokens") / 100.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) -
            col("n_punct") / greatest(col("n_chars"), lit(1)).cast("double")), 6))
      .withColumn("stop_ratio", col("n_stop") / greatest(col("n_tokens"), lit(1)).cast("double"))
      .withColumn("punct_ratio", col("n_punct") / greatest(col("n_chars"), lit(1)).cast("double"))
  }

  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    qualityScoreFrom(docs, idCol, tokens(col(textCol)), col(textCol))

  /** Token counts: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single symbols) — the cheap token-budget
    * estimator for LLM data pipelines. */
  def tokenCountsFrom(docs: DataFrame, idCol: String,
                      toksCol: org.apache.spark.sql.Column,
                      textCol: org.apache.spark.sql.Column): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(toksCol).as("ws_tokens"),
      size(regexp_extract_all(lower(textCol),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"),
      length(textCol).as("n_chars"))

  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokenCountsFrom(docs, idCol, tokens(col(textCol)), col(textCol))

  /** Order-sensitive document fingerprint: polynomial rolling hash over the
    * token-hash sequence, fp = fold(31·acc + h mod P). Same-token-multiset
    * docs with different order get different fingerprints (unlike MinHash). */
  def fingerprintFrom(docs: DataFrame, idCol: String,
                      toksCol: org.apache.spark.sql.Column): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      aggregate(
        transform(toksCol, t => strHash(t)),
        lit(0L),
        (acc, h) => (acc * 31L + h) % P).as("fp"))

  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    fingerprintFrom(docs, idCol, tokens(col(textCol)))

  /** Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1
    * quality rules): token count, distinct-token ratio, most-frequent-token
    * fraction, most-frequent-bigram fraction, and the repetition flag the
    * filter stage keys on. Boilerplate and degenerate generations are
    * exactly the docs these ratios expose.
    *
    * Shape: two explode→groupBy pipelines keyed by doc id joined back —
    * every shuffle is hash-partitioned on the id, no per-doc driver state,
    * so it scales as ordinary aggregation. Ratios are rounded to 6dp
    * BEFORE the flag comparison (CLAUDE.md float rule) so the flag is
    * cross-engine deterministic. */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
    val tokStats = base.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tok"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_tok"))
    // zip_with over two slices, NOT transform+element_at: element_at on
    // the outer array inside a lambda re-inlines its producer per element
    val bigrams = base.select(col("doc_id"),
      explode(when(size(col("toks")) >= 2,
        zip_with(slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>"))).as("bg"))
    val bgStats = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum(col("c")).as("n_bg"), max(col("c")).as("top_bg"))
    tokStats.join(bgStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tok"),
        round(col("n_distinct").cast("double") / col("n_tok"), 6).as("distinct_ratio"),
        round(col("top_tok").cast("double") / col("n_tok"), 6).as("top_tok_frac"),
        round(coalesce(col("top_bg").cast("double") / col("n_bg"), lit(0.0)), 6)
          .as("top_bigram_frac"))
      .withColumn("repetitive",
        col("top_bigram_frac") > 0.18 || col("distinct_ratio") < 0.2)
  }

  /** Gopher-style rule-battery document filter (Rae et al. 2021 §A1.1 —
    * the published pre-training keep/drop gate, distinct from the
    * soft [[qualityScore]]): per document, the word-statistics rules
    *   r_wc   minWords ≤ n_words ≤ maxWords
    *   r_mwl  mean word length within [mwlLo10, mwlHi10]/10 characters
    *   r_rep  distinct-word ratio ≥ repNum/repDen (templated/degenerate
    *          text fails here)
    *   r_stop ≥ minStop distinct stopwords present (Gopher's "contains
    *          required words" rule)
    * and keep = all four. Thresholds are corpus-tuned constants exactly
    * as Gopher's were; defaults discriminate on the synthetic fixture.
    *
    * EVERY comparison is all-integer (mean word length as
    * 10·Σlen ≥ lo·n rather than a float divide; the ratio as
    * den·distinct ≥ num·n), so flags are bit-identical cross-engine —
    * no rounded-double threshold can straddle an ulp. One narrow
    * projection pass, no joins, no shuffle: the filter runs at scan
    * speed on any corpus size. */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 30, maxWords: Int = 80,
                   mwlLo10: Int = 40, mwlHi10: Int = 50,
                   repNum: Int = 9, repDen: Int = 20,
                   minStop: Int = 2): DataFrame = {
    val toks = tokens(col(textCol))
    val allStop = typedlit(stopwords.flatMap(_._2))
    docs.select(
      col(idCol).as("doc_id"),
      size(toks).as("n_words"),
      size(array_distinct(toks)).as("n_distinct"),
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)).as("sum_wlen"),
      size(array_intersect(array_distinct(toks), allStop)).as("n_stop"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        col("sum_wlen"), col("n_stop"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .cast("int").as("r_wc"),
        (lit(10L) * col("sum_wlen") >= lit(mwlLo10.toLong) * col("n_words") &&
          lit(10L) * col("sum_wlen") <= lit(mwlHi10.toLong) * col("n_words"))
          .cast("int").as("r_mwl"),
        (lit(repDen.toLong) * col("n_distinct") >=
          lit(repNum.toLong) * col("n_words")).cast("int").as("r_rep"),
        (col("n_stop") >= minStop).cast("int").as("r_stop"))
      .withColumn("keep",
        (col("r_wc") * col("r_mwl") * col("r_rep") * col("r_stop")).cast("int"))
  }

  /** Zipf rank-frequency fit over the corpus vocabulary: least-squares
    * slope/intercept of ln(freq) against ln(rank) for the `topN` most
    * frequent tokens — the one-row corpus health stat (natural text slopes
    * ≈ −1; synthetic or templated corpora flatten). Deterministic rank
    * tie-break (count desc, token asc); each ln is rounded to 8dp then the
    * moment sums run in DECIMAL (order-independent), and the closed-form
    * slope/intercept divide as doubles rounded to 6dp. Shape: one token
    * count groupBy + a topN TakeOrdered + a single-row aggregate. */
  /** Jensen-Shannon divergence between the token distributions of two
    * corpus slices — the drift number a mixture/contamination monitor
    * alerts on (yesterday's crawl vs today's). Exact integer counts feed
    * one double ratio per token; each KL term rounds to 8 then sums in
    * DECIMAL(20,12) (the perplexity log discipline), so the result is
    * bit-identical at any parallelism and oracle-replayable. JS(P,Q) =
    * ½KL(P‖M) + ½KL(Q‖M) with M the even mixture: symmetric, 0 iff the
    * distributions coincide, ≤ ln 2. Scale shape: two token-keyed counts
    * + one full-outer join on token + one global aggregate — linear in
    * corpus tokens, never pairwise. Returns one row
    * (kl_a, kl_b, js_div, shared_vocab). */
  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String,
                   roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def counts(df: DataFrame) = df
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val ca = counts(a).select(col("tok"), col("c").as("ca"))
    val cb = counts(b).select(col("tok"), col("c").as("cb"))
    val na = ca.agg(sum(col("ca")).as("na"))
    val nb = cb.agg(sum(col("cb")).as("nb"))
    val pr = ca.join(cb, Seq("tok"), "full")
      .select(col("tok"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .withColumn("p", col("ca").cast("double") / col("na"))
      .withColumn("q", col("cb").cast("double") / col("nb"))
    val terms = pr
      .withColumn("ta", when(col("ca") > 0,
        round(col("p") * log(col("p") / ((col("p") + col("q")) / 2)), 8))
        .otherwise(lit(0.0)))
      .withColumn("tb", when(col("cb") > 0,
        round(col("q") * log(col("q") / ((col("p") + col("q")) / 2)), 8))
        .otherwise(lit(0.0)))
    terms.agg(
        round(sum(col("ta").cast(DecimalType(20, 12))).cast("double"), roundTo)
          .as("kl_a"),
        round(sum(col("tb").cast(DecimalType(20, 12))).cast("double"), roundTo)
          .as("kl_b"),
        count(when(col("ca") > 0 && col("cb") > 0, 1)).as("shared_vocab"))
      .select(col("kl_a"), col("kl_b"),
        round((col("kl_a") + col("kl_b")) / 2, roundTo).as("js_div"),
        col("shared_vocab"))
  }

  def zipfSlope(docs: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    val freq = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(topN)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("tok"))))
    val xy = freq.select(
      col("c"),
      round(log(col("rn").cast("double")), 8).cast("decimal(18,8)").as("x"),
      round(log(col("c").cast("double")), 8).cast("decimal(18,8)").as("y"))
    xy.agg(
        count(lit(1)).as("n"),
        sum(col("c")).as("mass"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      .select(
        col("n"), col("mass"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
          col("n"), 6).as("intercept"))
  }
}
