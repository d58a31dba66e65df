package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-pipeline column kernels: tokenization, shingling, and the
  * cross-engine string hash every dedup/fingerprint operator builds on.
  *
  * The hash spec is md5-prefix-as-int (first 15 hex digits → bigint, mod
  * 2^31-1): md5 is identical in every engine, 15 hex digits fit int64, and
  * the mod keeps products inside int64 for the affine MinHash permutations
  * (a·h+b with a ≤ 33 → < 2^36). Pure built-ins → whole-stage codegen.
  */
object TextOps {
  /** Modulus for all hash arithmetic: the Mersenne prime 2^31-1. */
  val P = 2147483647L

  /** Small files arrive as one scan partition; fan CPU-heavy per-row work
    * across the cluster before computing. (A semantic no-op: round-robin
    * repartition, applied only when the input is under-parallelized.) */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < want) df.repartition(want) else df
  }

  /** Lowercase whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Deterministic cross-engine string hash in [0, P). */
  def strHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long") % P

  /** All word k-grams in positional order (index j = window starting at
    * token j) — the stride-1 rolling windows substring dedup needs.
    * Built as a fold of zip_with over k shifted slices, NOT
    * transform+element_at: element_at(toks, j+o) inside the lambda makes
    * Catalyst inline the producer of `toks` (usually the whole tokenizer
    * chain) per ELEMENT — O(L²) regex work per doc. zip_with arguments
    * evaluate once per row. */
  def kgrams(toks: Column, k: Int): Column = {
    val n = size(toks) - (k - 1)
    val sh = (2 to k).foldLeft(slice(toks, lit(1), n)) { (acc, o) =>
      zip_with(acc, slice(toks, lit(o), n), (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) >= k, sh).otherwise(array().cast("array<string>"))
  }

  /** Word k-shingles: distinct k-grams (order dropped), e.g. k=3. */
  def shingles(toks: Column, k: Int = 3): Column =
    array_distinct(kgrams(toks, k))

  /** The SQL-literal coefficient list for the rolling polynomial window
    * fingerprint gh_j = Σ_o B^o·hv(tok_{j+o}) mod P, B = 131 (DuckDB
    * mirror of [[graft.functions.RollingWindowHash]]):
    * [B^0 % P, …, B^(k-1) % P]. */
  def windowCoefSql(k: Int): String =
    Array.iterate(1L, k)(c => (c * 131L) % P)
      .mkString("[", ", ", "]::BIGINT[]")

  /** The i-th MinHash permutation applied to a hash value: (2i+1)·h + 7919i
    * mod P — affine over the prime field, standard MinHash family. */
  def minhashPerm(hv: Column, i: Column): Column =
    ((lit(2L) * i + 1L) * hv + lit(7919L) * i) % P
}
