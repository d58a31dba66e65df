package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential-privacy release operators.
  *
  * The declared demo query (q_dp_mechanism, rel/TemporalQueries.scala)
  * pins the Laplace-mechanism ARITHMETIC cross-engine but is
  * deliberately non-private: a declared query's full text is published
  * by the oracle contract, so its noise is publicly recomputable. THIS
  * is the operator a real pipeline uses: the noise draw is keyed by a
  * SECRET per-release seed passed in as a parameter — from a secret
  * store, never persisted in the released artifact — so the release is
  * reproducible by the seed holder (auditable/replayable) and opaque to
  * everyone else. Anyone holding the seed can denoise; seed custody IS
  * the privacy boundary, exactly as with any keyed mechanism.
  *
  * Mechanism: u = (xxhash64(seed, key) → (0,1)), then the inverse-CDF
  * Laplace transform noise = −(Δf/ε)·sign(u−½)·ln(1−2|u−½|). xxhash64
  * is a public, well-mixed 64-bit hash (Spark built-in, codegen'd);
  * mapping its output through /2⁶⁴ gives u uniform on (−½,½) up to
  * 2⁻⁶⁴ granularity. One projection over an already-aggregated frame —
  * no shuffle of its own at any scale.
  *
  * Floating-point caveat, stated rather than hidden: like every
  * float-Laplace implementation, the finite mantissa makes this
  * nominally-ε mechanism vulnerable to Mironov-style least-significant-
  * bit attacks (CCS 2012); production hardening adds the snapping
  * mechanism (clamp + round to a fixed grid) which `snap` provides.
  */
object Privacy {

  /** u ∈ (−0.5, 0.5) keyed by (secret seed, group key). */
  private def uniform(seed: Long, key: Column): Column =
    // xxhash64 over (seed literal, key), masked to its low 53 bits so the
    // whole transform stays EXACT in double arithmetic: h53 ∈ [0, 2^53),
    // h53 + 0.5 is exactly representable (< 2^53 needs ≤ 53 mantissa
    // bits), and dividing by 2^53 is a pure exponent shift. The result
    // is strictly inside the open interval — |u| ≤ 0.5 − 2⁻⁵⁴, so the
    // ln(1−2|u|) downstream can never see 0. (The previous full-64-bit
    // form lost the +0.5 to rounding for |hash| ≥ 2^53 and could yield
    // u = ±0.5 exactly within half an ulp of ±2^63 → log(0) = −Inf and
    // a saturated release row, ~2⁻⁵⁴ per key.)
    (xxhash64(lit(seed), key).bitwiseAND(lit((1L << 53) - 1)).cast("double")
      + lit(0.5)) / lit((1L << 53).toDouble) - lit(0.5)

  /** Laplace noise with scale b = sensitivity/epsilon, keyed by
    * (seed, key): reproducible for the seed holder, Laplace(b)
    * distributed across keys. */
  def laplaceNoise(key: Column, epsilon: Double, sensitivity: Double,
                   seed: Long): Column = {
    require(epsilon > 0, "epsilon must be positive")
    val b = sensitivity / epsilon
    val u = uniform(seed, key)
    -lit(b) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
  }

  /** Snapping post-process (Mironov CCS 2012): round the noisy value to
    * a fixed grid Λ and clamp to ±B, closing the floating-point
    * least-significant-bit side channel at a small ε cost. */
  def snap(noisy: Column, lambda: Double, bound: Double): Column =
    greatest(least(round(noisy / lambda, 0) * lambda, lit(bound)), -lit(bound))

  /** ε-DP count release over a pre-aggregated frame `counts(keyCol,
    * cntCol)`: adds seed-keyed Laplace(1/ε) noise (count sensitivity 1),
    * floors, and clamps at 0. The output deliberately EXCLUDES the true
    * count — this is the public artifact, unlike the q_dp_mechanism
    * audit view. Columns: keyCol, released, epsilon. */
  def laplaceRelease(counts: DataFrame, keyCol: String, cntCol: String,
                     epsilon: Double, seed: Long): DataFrame = {
    val noise = laplaceNoise(col(keyCol), epsilon, sensitivity = 1.0, seed)
    counts.select(
      col(keyCol),
      greatest(floor(col(cntCol) + noise).cast("long"), lit(0L))
        .as("released"),
      lit(epsilon).as("epsilon"))
  }
}
