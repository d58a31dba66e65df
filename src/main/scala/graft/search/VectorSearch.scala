package graft.search

import graft.functions.vec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-scan vector top-k (reference O12, app.py:394-444), Spark-planned:
  * the scan + dot-product + TakeOrderedAndProject pipeline is one
  * whole-stage-codegen span, the top-k is per-partition heaps merged at the
  * driver (no global sort), and the dim-mismatch skip (app.py:407-408) is a
  * pushed-down `size(vector) = |q|` filter.
  *
  * Scale: O(N·d) scan work distributed over partitions; no shuffle at all —
  * the only data movement is k rows per partition to the driver. This is the
  * exact-result baseline; `graft.pipeline.Similarity` adds the LSH-bucketed
  * approximate path for when even one scan pass is too much.
  */
object VectorSearch {

  /** Score every row's `vecCol` against a literal query vector; skip
    * dim-mismatched vectors; return top-k by (score desc, id asc). */
  def topK(embeddings: DataFrame, idCol: String, vecCol: String,
           query: Seq[Double], k: Int,
           scoreCol: String = "vector_score",
           cosine: Boolean = false,
           roundTo: Option[Int] = None): DataFrame = {
    val qv = typedlit(query)
    val raw: Column =
      if (cosine) vec.cosine(col(vecCol), qv) else vec.dot(col(vecCol), qv)
    val score = roundTo.fold(raw)(d => round(raw, d))
    embeddings
      .filter(size(col(vecCol)) === query.length)
      .select(col(idCol), score.as(scoreCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .limit(k)
  }
}
