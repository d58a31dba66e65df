package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

/** BM25-Okapi keyword scoring as pure DataFrame aggregation algebra
  * (reference O14-O15, app.py:453-489; formula per rank_bm25 0.2.2's
  * BM25Okapi: k1=1.5, b=0.75, idf = ln((N-df+0.5)/(df+0.5)) with negative
  * idfs floored to epsilon * avg_idf, epsilon=0.25).
  *
  * The reference rebuilds its in-memory index O(N) on every mutation
  * (app.py:772-773); here the "index" is two derived DataFrames (per-(doc,
  * term) TF and per-term IDF) that callers `persist()` and invalidate on
  * write — same contract, amortized. At 100 TB the TF build is one
  * explode+groupBy shuffle keyed on (doc,term); scoring joins the tiny query
  * term list (broadcast) against TF, so the only big shuffle is the final
  * per-doc sum, which Catalyst runs partial+final.
  */
object Bm25 {
  val K1 = 1.5
  val B = 0.75
  val Epsilon = 0.25

  /** Reference tokenization: lowercase, split on whitespace (app.py:365-366,
    * 456-458); trim + drop empties so "" never becomes a term. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** One composed plan: docs → scores for `terms`, reference semantics
    * (score > 0 filter per app.py:486), deterministic (score rounded to 6dp
    * before ranking, doc id tie-break). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            terms: Seq[String], topK: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val base = TextOps.spread(docs)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .withColumn("dl", size($"toks"))
    // corpus stats: N and average doc length over ALL docs (empty included,
    // matching BM25Okapi's corpus_size/avgdl)
    val stats = base.agg(count(lit(1)).as("n"), avg($"dl").as("avgdl"))

    val tf = base
      .select($"doc_id", $"dl", explode($"toks").as("t"))
      .groupBy($"doc_id", $"t")
      .agg(count(lit(1)).as("tf"), first($"dl").as("dl"))

    val idfRaw = tf.groupBy($"t").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_raw", log(($"n" - $"df" + 0.5) / ($"df" + 0.5)))
    val avgIdf = idfRaw.agg(avg($"idf_raw").as("avg_idf"))
    val idf = idfRaw.crossJoin(broadcast(avgIdf))
      .select($"t",
        when($"idf_raw" < 0, lit(Epsilon) * $"avg_idf").otherwise($"idf_raw").as("idf"),
        $"avgdl")

    val q = terms.toDF("t")
    tf.join(broadcast(q), "t")
      .join(broadcast(idf), "t")
      .withColumn("contrib",
        $"idf" * ($"tf" * (K1 + 1.0)) /
          ($"tf" + lit(K1) * (lit(1.0 - B) + lit(B) * $"dl" / $"avgdl")))
      .groupBy($"doc_id")
      .agg(round(sum($"contrib"), 6).as("score"))
      .filter($"score" > 0)
      .orderBy($"score".desc, $"doc_id")
      .limit(topK)
  }
}
