package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic ABSOLUTE-size audit sampling.
  *
  * Quadratic-cost audits (exact kNN hubness, label-propagation checks)
  * must run over a sample whose SIZE is independent of corpus rows —
  * a fixed fraction (`id % k`) silently scales pair volume with the
  * square of the corpus and is wrong at 100 TB. The convention here is
  * the one q_dedup_lsh_pr established: a bounded set, chosen
  * deterministically so Spark and the DuckDB oracle agree bit-for-bit.
  *
  * Sample rule: order by (md5(id), id), take the first n. md5 of the
  * decimal string renders identically in both engines; the id tie-break
  * makes the order total. Spark executes this as a per-partition top-n
  * merge (TakeOrderedAndProject / partial sort-limit), never a global
  * sort — constant output no matter the corpus size.
  */
object Audit {
  /** First `n` rows of `df` by (md5(idCol), idCol) — a deterministic,
    * corpus-size-independent sample. */
  def sample(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(n)

  /** DuckDB mirror of [[sample]]: the ORDER BY … LIMIT clause tail. */
  def sampleSql(idCol: String, n: Int): String =
    s"ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol LIMIT $n"
}
