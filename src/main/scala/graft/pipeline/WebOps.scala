package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL column kernels for web-corpus pipelines: component parsing feeds
  * source-level analytics; canonicalization feeds URL-keyed dedup (the
  * cheapest dedup signal a crawl pipeline has — one string kernel + one
  * hash-partitioned groupBy, no content comparison at all).
  *
  * Everything is built-in regexp/string functions — whole-stage codegen,
  * no UDFs — and every regex is mirrored verbatim by the DuckDB oracle in
  * rel.ScaleQueries, so the canonical form is cross-engine deterministic.
  */
object WebOps {
  /** Lowercase the scheme+authority prefix, keep the path verbatim
    * (URL paths are case-sensitive; hosts are not, RFC 3986 §6.2.2.1). */
  def lowerHost(url: Column): Column =
    concat(lower(regexp_extract(url, "(?i)^(https?://[^/]+)", 1)),
      regexp_extract(url, "(?i)^https?://[^/]+(.*)$", 1))

  /** Canonical URL for dedup keys: lowercase scheme+host, strip the
    * fragment, strip a tracking-only (`utm_*`) query, strip one trailing
    * slash. Order matters — the utm strip is `$`-anchored so the fragment
    * must go first; each pattern can match at most once, so Spark's
    * replace-all and DuckDB's replace-first agree. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(lowerHost(url), "#.*$", "")
    val noUtm = regexp_replace(noFrag, "\\?utm_[^#]*$", "")
    regexp_replace(noUtm, "/$", "")
  }
}
