package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Privacy

/** The seeded Laplace release (pipeline/Privacy.scala) — the REAL DP
  * operator behind the q_dp_mechanism transform demo. Pins what the
  * advisor's round-8 finding demanded: the noise must be a function of
  * a secret seed, not of the group key alone. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def counts =
    (0 until 5000).map(k => (k.toLong, 100L + k % 7)).toDF("k", "cnt")

  test("same seed reproduces the release bit-for-bit") {
    val a = Privacy.laplaceRelease(counts, "k", "cnt", 0.5, seed = 42L)
      .orderBy($"k").collect()
    val b = Privacy.laplaceRelease(counts, "k", "cnt", 0.5, seed = 42L)
      .orderBy($"k").collect()
    assert(a.sameElements(b))
  }

  test("the seed actually keys the noise — different seed, different release") {
    val a = Privacy.laplaceRelease(counts, "k", "cnt", 0.5, 42L)
    val b = Privacy.laplaceRelease(counts, "k", "cnt", 0.5, 43L)
    val differing = a.withColumnRenamed("released", "ra")
      .join(b.select($"k", $"released".as("rb")), "k")
      .filter($"ra" =!= $"rb").count()
    // With Laplace(b=2) noise, two independent draws land on the same
    // floored count only when they fall in the same unit interval —
    // most keys must differ, else the seed is not entering the hash.
    assert(differing > 2500, s"only $differing/5000 keys changed with the seed")
  }

  test("noise is not recomputable from the key alone (demo failure mode)") {
    // The q_dp_mechanism demo's Weyl hash of the key: if laplaceRelease
    // degenerated to that, noise(k) would be identical across seeds and
    // this spec's previous test already fails; here we also pin that
    // noise varies across keys with EQUAL true counts (k and k+7 share
    // cnt): a constant or count-derived noise would release equal values.
    val rel = Privacy.laplaceRelease(counts, "k", "cnt", 0.5, 7L)
      .filter($"k" % 7 === 0).select($"released").distinct().count()
    assert(rel > 10, "noise must vary across equal-count keys")
  }

  test("empirical distribution matches Laplace(b = 1/eps)") {
    val eps = 0.5 // b = 2: E|noise| = 2, median |noise| = 2 ln 2
    val noise = counts.select(
      Privacy.laplaceNoise($"k", eps, 1.0, seed = 99L).as("x"))
    val stats = noise.agg(
      avg(abs($"x")).as("meanAbs"),
      avg(when($"x" > 0, 1.0).otherwise(0.0)).as("posFrac"),
      max(abs($"x")).as("maxAbs")).head()
    val meanAbs = stats.getDouble(0)
    val posFrac = stats.getDouble(1)
    // mean |Laplace(2)| = 2, sd of the 5000-sample mean ≈ 2/√5000 ≈ 0.03
    assert(math.abs(meanAbs - 2.0) < 0.2, s"mean |noise| = $meanAbs, want ~2")
    assert(math.abs(posFrac - 0.5) < 0.05, s"sign balance $posFrac, want ~0.5")
  }

  test("release is nonnegative and excludes the true count column") {
    val rel = Privacy.laplaceRelease(
      Seq((1L, 0L), (2L, 1L), (3L, 2L)).toDF("k", "cnt"), "k", "cnt", 0.5, 5L)
    assert(rel.columns.toSeq == Seq("k", "released", "epsilon"))
    assert(rel.filter($"released" < 0).count() == 0)
  }

  test("snapping clamps and grids") {
    val snapped = counts.select(Privacy.snap(
      Privacy.laplaceNoise($"k", 0.5, 1.0, 1L), lambda = 0.25, bound = 8.0)
      .as("s"))
    val bad = snapped.filter(abs($"s") > 8.0 ||
      abs($"s" / 0.25 - round($"s" / 0.25, 0)) > 1e-9).count()
    assert(bad == 0)
  }
}
