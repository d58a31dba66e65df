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

  /** Distinct-stopword hit counts per language + argmax prediction
    * (tie-break: list order en > de > es > fr). */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = array_distinct(tokens(col(textCol)))
    val withHits = docs.select(
      (col(idCol).as("doc_id") +:
        stopwords.map { case (lang, words) =>
          size(array_intersect(toks, typedlit(words))).as(s"hits_$lang")
        }): _*)
    // explicit argmax CASE chain, first-listed language wins ties
    val Seq(en, de, es, fr) = stopwords.map(l => col(s"hits_${l._1}"))
    withHits.withColumn("pred_lang",
      when(en >= de && en >= es && en >= fr, "en")
        .when(de >= es && de >= fr, "de")
        .when(es >= fr, "es")
        .otherwise("fr"))
  }

  /** Heuristic quality score from length / punctuation / stopword ratios
    * (the usual pre-training corpus filters). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val lower6 = lower(col(textCol))
    val allStop = typedlit(stopwords.flatMap(_._2))
    docs.select(
      col(idCol).as("doc_id"),
      size(toks).as("n_tokens"),
      length(col(textCol)).as("n_chars"),
      (length(lower6) - length(regexp_replace(lower6, "[^a-z0-9 ]", "")))
        .as("n_punct"),
      size(array_intersect(array_distinct(toks), allStop)).as("n_stop"))
      .withColumn("stop_ratio", col("n_stop") / greatest(col("n_tokens"), lit(1)).cast("double"))
      .withColumn("punct_ratio", col("n_punct") / greatest(col("n_chars"), lit(1)).cast("double"))
      .withColumn("quality", round(
        lit(0.4) * col("stop_ratio") +
          lit(0.3) * least(col("n_tokens") / 100.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) - col("punct_ratio")), 6))
  }

  /** Token counts: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single symbols) — the cheap token-budget
    * estimator for LLM data pipelines. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Order-sensitive document fingerprint: polynomial rolling hash over the
    * token-hash sequence, fp = fold(31·acc + h mod P). Same-token-multiset
    * docs with different order get different fingerprints (unlike MinHash). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      aggregate(
        transform(tokens(col(textCol)), t => strHash(t)),
        lit(0L),
        (acc, h) => (acc * 31L + h) % P).as("fp"))
}
