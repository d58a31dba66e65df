package graft

import graft.hybrid.HybridSearch
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpec {
  import spark.implicits._

  private val nodes = Seq("A", "B", "C", "D").toDF("id")

  test("TC-HYB-01: final == vw*vec_norm + gw*graph_score exactly") {
    val vec = Seq(("A", 0.9), ("B", 0.5), ("C", 0.1)).toDF("id", "vector_score")
    val g = Seq(("B", 0.8), ("C", 1.0)).toDF("id", "graph_score")
    val got = HybridSearch.fuse(nodes, vec, Some(g), 0.7, 0.3, 10)
      .select($"id", $"vec_norm", $"graph_score", $"final_score")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    got.values.foreach { case (_, vn, gs, f) =>
      assert(math.abs(f - (0.7 * vn + 0.3 * gs)) < 1e-6)
    }
    // min-max: A → 1.0, B → 0.5, C → 0.0; D absent from vec → 0.0
    assert(got("A")._2 == 1.0 && got("B")._2 == 0.5 && got("C")._2 == 0.0)
    assert(!got.contains("D"), "no vector + no graph → final 0 → dropped")
  }

  test("TC-HYB-02a: weights (1,0) reproduce pure vector ordering; bottom node dropped") {
    val vec = Seq(("A", 0.9), ("B", 0.5), ("C", 0.1)).toDF("id", "vector_score")
    val got = HybridSearch.fuse(nodes, vec, None, 1.0, 0.0, 10)
      .select($"id").as[String].collect().toSeq
    // C is min-maxed to 0.0 → final 0 → dropped (app.py:726); D has no vector → dropped
    assert(got == Seq("A", "B"), s"$got")
  }

  test("TC-HYB-02b: weights (0,1) → final == graph_score for every item") {
    val vec = Seq(("A", 0.9), ("B", 0.5)).toDF("id", "vector_score")
    val g = Seq(("B", 0.8), ("C", 0.6)).toDF("id", "graph_score")
    val got = HybridSearch.fuse(nodes, vec, Some(g), 0.0, 1.0, 10)
      .select($"id", $"graph_score", $"final_score")
      .as[(String, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, gs, f) => assert(f == gs) }
    assert(got.map(_._1).toSeq == Seq("B", "C"), "graph-close outranks vector-similar")
  }

  test("degenerate all-equal vector scores normalize to 1.0 (app.py:704-705)") {
    val vec = Seq(("A", 0.4), ("B", 0.4)).toDF("id", "vector_score")
    val got = HybridSearch.fuse(nodes, vec, None, 1.0, 0.0, 10)
      .select($"id", $"vec_norm").as[(String, Double)].collect().toMap
    assert(got == Map("A" -> 1.0, "B" -> 1.0), s"$got")
  }

  test("empty vector side: no rows survive final>0 with no graph signal") {
    val vec = spark.emptyDataset[(String, Double)].toDF("id", "vector_score")
    val got = HybridSearch.fuse(nodes, vec, None, 0.7, 0.3, 10).collect()
    assert(got.isEmpty)
  }

  test("rrfFuse matches hand-computed reciprocal rank sums") {
    // ranker 1: A(0.9) B(0.8) C(0.7); ranker 2: B(5.0) A(1.0) — C absent
    val r1 = Seq(("A", 0.9), ("B", 0.8), ("C", 0.7)).toDF("id", "score")
    val r2 = Seq(("B", 5.0), ("A", 1.0)).toDF("id", "score")
    val got = HybridSearch.rrfFuse(Seq(r1, r2), topK = 10)
      .as[(String, Double)].collect().toMap
    val want = Map(
      "A" -> (1.0 / 61 + 1.0 / 62), // rank 1 + rank 2
      "B" -> (1.0 / 62 + 1.0 / 61), // rank 2 + rank 1
      "C" -> 1.0 / 63)              // rank 3, one ranker only
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"$k: ${got(k)} != $v") }
    // tie on score → id breaks the rank deterministically
    val tied = Seq(("B", 0.5), ("A", 0.5)).toDF("id", "score")
    val t = HybridSearch.rrfFuse(Seq(tied), topK = 10)
      .as[(String, Double)].collect().toMap
    assert(t("A") == 1.0 / 61 && t("B") == 1.0 / 62)
  }

  test("rrfFuse enforces the pre-limited-input precondition in-plan") {
    val big = spark.range(0, 50).select(
      concat(lit("n"), $"id").as("id"), ($"id" * 1.0).as("score"))
    val small = Seq(("A", 0.9), ("B", 0.8)).toDF("id", "score")
    // over-limit ranker raises during execution (not silently serialized)
    val ex = intercept[Exception] {
      HybridSearch.rrfFuse(Seq(big, small), topK = 10, maxInput = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("pre-limit RRF inputs")), msgs(ex).mkString("|"))
    // at-limit inputs pass untouched
    val ok = HybridSearch.rrfFuse(Seq(big, small), topK = 5, maxInput = 50)
      .collect()
    assert(ok.length == 5)
    // the rank window is partitioned by ranker id, never a global
    // single-partition window over the union
    val plan = HybridSearch.rrfFuse(Seq(big, small), topK = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }
}
