package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join via partition-based signatures —
  * PassJoin (Li, Deng, Wang, Feng, ICDE 2011), the public
  * segment-filter algorithm for ed(A,B) ≤ d joins that never goes
  * all-pairs.
  *
  * Filter theorem: partition B into d+1 contiguous segments. Any
  * alignment witnessing ed(A,B) ≤ d has ≤ d edited positions, so by
  * pigeonhole at least one segment of B survives error-free; its image
  * in A starts within ±d of its own position (each insertion/deletion
  * before it shifts the image by one, and there are ≤ d of them). So
  * A must contain one of B's segments VERBATIM at a nearby offset —
  * an equi-join between B's (segment-index, segment) keys and A's
  * (segment-index, shifted-substring) probe keys finds every true
  * pair. Candidate volume is the sum over segment values of
  * |probes|·|segments| posting-list products — the discriminative
  * power of length-⌈L/(d+1)⌉ substrings, never |A|·|B|.
  *
  * Both directions are covered symmetrically: every string emits both
  * its segments and its probes, and the theorem fires for pair (A,B)
  * through B's segments regardless of which side A sits on.
  *
  * The 100 TB shape: two narrow exploded projections (d+1 segments,
  * ≤ (d+1)(2d+1) probes per string), one equi-join on the
  * (index, substring) key, a distinct on candidate pairs, then exact
  * `levenshtein` verification on candidates only. Skew = the hottest
  * segment value's posting list; for near-uniform text the lists are
  * tiny, and a frequency cap on pathological segments (the winnowing
  * convention) composes if a corpus needs it.
  */
object EditDist {

  /** All unordered pairs (a < b) from `df(idCol, sigCol)` — strings of
    * EXACTLY length `len` — within Levenshtein distance ≤ `d`, as
    * (a, b, ed). Exact: candidate generation is the PassJoin segment
    * filter (no false negatives per the theorem above), verification
    * is the built-in codegen `levenshtein`.
    *
    * The exactly-length-`len` contract is ENFORCED, not just
    * documented: rows whose signature is any other length are filtered
    * out up front (their segment/probe arithmetic would be off-spec and
    * silently drop true pairs — and since a mirrored oracle shares the
    * same candidate generation, no hash check would catch it). Callers
    * with mixed lengths run one invocation per length bucket — the
    * standard PassJoin length-partitioning — rather than feeding
    * off-length strings to a single call. */
  def passJoinPairs(df: DataFrame, idCol: String, sigCol: String,
                    len: Int, d: Int): DataFrame = {
    val nSeg = d + 1
    val segLen = len / nSeg
    require(segLen >= 1, s"len=$len too short for ${nSeg} segments")
    require(len % nSeg == 0,
      s"len=$len must divide into ${nSeg} equal segments (simplest " +
        "partition scheme; uneven tails are a straightforward extension)")

    val base = df.select(col(idCol).as("id"), col(sigCol).as("sig"))
      .filter(length(col("sig")) === len)
    val idx = array((1 to nSeg).map(lit): _*)
    // B-side keys: segment i at its home position
    val segs = base
      .select(col("id"), col("sig"), explode(idx).as("i"))
      .select(col("id").as("g_id"), col("i"),
        expr(s"substring(sig, 1 + (i-1)*$segLen, $segLen)").as("sub"))
    // A-side keys: segment-i-shaped substrings at every offset within ±d
    val shifts = array((-d to d).map(lit): _*)
    val probes = base
      .select(col("id"), col("sig"), explode(idx).as("i"))
      .select(col("id"), col("i"), col("sig"), explode(shifts).as("sh"))
      .select(col("id"), col("i"),
        (expr(s"1 + (i-1)*$segLen") + col("sh")).as("st"), col("sig"))
      .filter(col("st") >= 1 && col("st") <= len - segLen + 1)
      .select(col("id").as("p_id"), col("i"),
        expr(s"substring(sig, st, $segLen)").as("sub"))

    val cand = probes.join(segs, Seq("i", "sub"))
      .filter(col("p_id") =!= col("g_id"))
      .select(least(col("p_id"), col("g_id")).as("a"),
        greatest(col("p_id"), col("g_id")).as("b"))
      .distinct()

    val sa = base.select(col("id").as("a"), col("sig").as("sig_a"))
    val sb = base.select(col("id").as("b"), col("sig").as("sig_b"))
    cand.join(sa, "a").join(sb, "b")
      .withColumn("ed", levenshtein(col("sig_a"), col("sig_b")))
      .filter(col("ed") <= d)
      .select(col("a"), col("b"), col("ed"))
  }
}
