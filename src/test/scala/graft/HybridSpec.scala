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
}
