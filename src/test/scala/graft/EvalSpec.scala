package graft

import org.apache.spark.sql.functions._

/** Property pins for the generation-eval metric family (rel/EvalQueries)
  * and the Holt smoother — closed-form identities a refactor must keep. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("CER is 0 on identical strings and counts pure substitutions exactly") {
    val df = Seq(("abcdef", "abcdef"), ("abcdef", "abXdeY")).toDF("r", "h")
      .select(levenshtein($"r", $"h").as("ed"))
    assert(df.as[Int].collect().toSeq == Seq(0, 2))
  }

  test("declared CER rows: ed <= ref_len bound and cer in [0, ~2]") {
    val rows = SparkEntry.queries("q_eval_cer")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (len, ed, cer) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      assert(ed >= 0 && cer >= 0.0 && cer == math.floor(cer * 1e6 + 0.5) / 1e6 ||
        math.abs(cer - ed.toDouble / len) < 1e-6)
      // hyp is a same-length-ish corruption: distance can't exceed the
      // longer side, and ref_len>0 is enforced by the query
      assert(len > 0 && ed <= 400)
    }
  }

  test("BLEU is 1.0 for an identical hypothesis (uncorrupted doc)") {
    // a doc with no 'the' and fewer than 4 tokens keeps positions 0..2
    // (% 7 = 3 never fires) — hypothesis == reference => p1 = p2 = BP = 1
    val bleu = SparkEntry.queries("q_eval_bleu")(spark, sf)
    val perfect = bleu.filter($"m1" === $"h_len" && $"m2" === $"h_len" - 1 &&
      $"h_len" === $"r_len")
    // such docs exist in the fixture only if untouched by the corruption;
    // the identity we pin is conditional: whenever clipping is total and
    // lengths match, bleu must be exactly 1.0
    assert(perfect.filter($"bleu" =!= 1.0).count() == 0)
  }

  test("ROUGE F1 collapses to 2m/(h2+r2) and is bounded by min(P,R) .. max") {
    val r = SparkEntry.queries("q_eval_rouge")(spark, sf)
      .select($"m2", $"h2", $"r2", $"prec", $"rec", $"f1").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (m, h2, r2) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val f = row.getDouble(5)
      val expect = math.floor(2.0 * m / (h2 + r2) * 1e6 + 0.5) / 1e6
      assert(f == expect, s"f1 $f != $expect for m=$m h2=$h2 r2=$r2")
      assert(f >= math.min(row.getDouble(3), row.getDouble(4)) - 1e-6)
      assert(f <= math.max(row.getDouble(3), row.getDouble(4)) + 1e-6)
    }
  }

  test("kappa: identical labelers give 1, and the declared audit is in [-1,1]") {
    val row = SparkEntry.queries("q_label_kappa")(spark, sf).head
    val k = row.getDouble(7)
    assert(k >= -1.0 && k <= 1.0)
    // closed form on a hand confusion matrix: perfect agreement
    val (n11, n10, n01, n00) = (7L, 0L, 0L, 3L)
    val n = n11 + n10 + n01 + n00
    val e = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    assert((n * (n11 + n00) - e).toDouble / (n * n - e) == 1.0)
  }

  test("ECE: bins partition the score range and the summary matches the bins") {
    val rows = SparkEntry.queries("q_text_classifier_ece")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ece = rows.head.getDouble(5)
    assert(ece >= 0.0 && ece <= 1.0)
    assert(rows.map(_.getInt(0)).toSet.subsetOf((0 to 9).toSet))
    // recompute from the (floor-6) bin rows — must agree within the
    // rounding slack the output carries (gaps floor-8 pre-sum, acc/conf
    // floor-6 in the report)
    val n = rows.map(_.getLong(1)).sum.toDouble
    val recomputed = rows.map(r =>
      r.getLong(1) * math.abs(r.getDouble(3) - r.getDouble(4))).sum / n
    assert(math.abs(recomputed - ece) < 2e-5, s"$recomputed vs $ece")
  }

  test("Bradley-Terry: strengths normalize and respect dominant win rates") {
    val rows = SparkEntry.queries("q_pref_bt")(spark, sf).collect()
    assert(rows.nonEmpty)
    val strengths = rows.map(_.getDouble(3))
    assert(math.abs(strengths.sum - 1.0) < 1e-4, s"sum ${strengths.sum}")
    assert(strengths.forall(s => s > 0.0 && s < 1.0))
    // output is ordered strength desc — the top item must not have a
    // lower win RATE than the bottom item (MM preserves gross dominance)
    val top = rows.head; val bot = rows.last
    def rate(r: org.apache.spark.sql.Row) =
      r.getLong(1).toDouble / r.getLong(2)
    assert(rate(top) >= rate(bot) - 1e-9)
  }

  test("temperature sampling: weights normalize, small domains boosted") {
    val rows = SparkEntry.queries("q_mix_temperature")(spark, sf).collect()
    val ws = rows.map(_.getDouble(2))
    assert(math.abs(ws.sum - 1.0) < 1e-4)
    val toks = rows.map(_.getLong(1))
    val mean = toks.sum.toDouble / toks.length
    // sqrt-law: every below-mean domain has boost > 1 iff above-mean
    // domains exist to donate mass (true on this fixture)
    rows.foreach { r =>
      val boost = r.getDouble(3)
      if (r.getLong(1) < mean * 0.5) assert(boost > 1.0,
        s"${r.getString(0)}: boost $boost for ${r.getLong(1)} toks")
    }
  }

  test("Holt on the declared series: level+trend one-step identity") {
    // forecast_next must equal the floor-6 of (l + b) of the SAME row,
    // and the recursion must start at l1 = x1 (level equals the first
    // observation exactly)
    val rows = SparkEntry.queries("q_stats_holt")(spark, sf)
      .orderBy($"t").collect()
    assert(rows.length >= 2)
    val first = rows.head
    assert(first.getDouble(2) == first.getLong(1).toDouble, "l1 = x1")
    rows.foreach { r =>
      assert(r.getDouble(4) >= r.getDouble(2) + r.getDouble(3) - 2e-6 &&
        r.getDouble(4) <= r.getDouble(2) + r.getDouble(3) + 2e-6)
    }
  }
}
