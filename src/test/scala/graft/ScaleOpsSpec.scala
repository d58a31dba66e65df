package graft

import graft.graph.GraphAnalytics
import graft.operators.ZOrder
import graft.pipeline.{TextAnalysis, WebOps}
import org.apache.spark.sql.functions._

/** Round-4 operators: label propagation, k-core peeling, repetition
  * metrics, URL canonicalization, Z-order interleave. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("labelPropagation: min-label flood, bounded radius per round") {
    // path 0-1-2-3 plus isolated pair 8-9
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val r1 = GraphAnalytics.labelPropagation(g, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L, 8L -> 8L, 9L -> 8L),
      s"one round reaches radius 1: $r1")
    val r3 = GraphAnalytics.labelPropagation(g, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r3 == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 8L -> 8L, 9L -> 8L),
      s"diameter rounds converge to component minima: $r3")
  }

  test("labelPropagation: partition-order independent") {
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val a = GraphAnalytics.labelPropagation(g, 2).as[(Long, Long)].collect().toMap
    val b = GraphAnalytics.labelPropagation(g.repartition(7), 2)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("kCorePeel: pendant chain peels outside-in, core survives") {
    // K4 on 0..3, chain 4-5 hanging off node 0
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val g = (k4 ++ Seq((0L, 4L), (4L, 5L))).toDF("src", "dst")
    val got = GraphAnalytics.kCorePeel(g, k = 2, rounds = 4)
      .as[(Long, Int)].collect().toMap
    // round 1 drops 5 (deg 1); round 2 drops 4 (its only surviving edge is 0)
    assert(got == Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 0, 4L -> 2, 5L -> 1),
      s"onion rounds: $got")
  }

  test("kCorePeel: declared round budget is past the fixpoint on the fixture") {
    val edges = rel.ScaleQueries.sparseEdges(spark, sf)
    val r8 = GraphAnalytics.kCorePeel(edges, k = 5, rounds = 8)
      .as[(Long, Int)].collect().toMap
    val r9 = GraphAnalytics.kCorePeel(edges, k = 5, rounds = 9)
      .as[(Long, Int)].collect().toMap
    assert(r8 == r9, "round 9 must change nothing (fixpoint reached by 8)")
    // sf0.001 has no 5-core (everything peels) but the onion must still
    // have layers — multiple distinct rounds, not one trivial wipe
    assert(r8.values.toSet.size > 1,
      s"peel rounds must show structure: ${r8.values.toSet}")
  }

  test("labelPropagation: declared 3 rounds keep real structure on the fixture") {
    val edges = rel.ScaleQueries.sparseEdges(spark, sf)
    val labels = GraphAnalytics.labelPropagation(edges, iters = 3)
      .select($"label").distinct().count()
    assert(labels > 1, "3 rounds must NOT collapse to one label (vacuous)")
  }

  test("repetitionMetrics: degenerate doc flagged, varied doc not") {
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "the quick brown fox jumps over lazy dogs tonight"),
      (3L, "x")).toDF("id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "id", "text")
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, dr1, tt1, bg1, rep1) = m(1L)
    assert(n1 == 5L && dr1 == 0.4 && tt1 == 0.6 && bg1 == 0.5 && rep1,
      s"'a b a b a': ${m(1L)}")
    val (_, n2, dr2, _, _, rep2) = m(2L)
    assert(n2 == 9L && dr2 == 1.0 && !rep2)
    // single token: no bigrams -> frac 0.0 via coalesce, not null/NaN
    val (_, n3, _, _, bg3, rep3) = m(3L)
    assert(n3 == 1L && bg3 == 0.0 && !rep3)
  }

  test("canonicalize: tracking variants collapse, meaningful parts survive") {
    val urls = Seq(
      "https://Docs.Example.COM/A/b/?utm_source=x&utm_campaign=y#frag",
      "https://docs.example.com/A/b",
      "https://docs.example.com/A/b?id=7",       // real query survives
      "https://docs.example.com/a/b").toDF("url") // path case-sensitive
    val got = urls.select(WebOps.canonicalize($"url")).as[String].collect()
    assert(got(0) == "https://docs.example.com/A/b", s"variant: ${got(0)}")
    assert(got(1) == got(0))
    assert(got(2) == "https://docs.example.com/A/b?id=7")
    assert(got(3) == "https://docs.example.com/a/b")
    assert(got(3) != got(0), "path case must be preserved (RFC 3986)")
  }

  test("interleave: bit positions, and SQL fragment mirrors the Column form") {
    val df = Seq((3L, 1L), (0L, 0L), (1023L, 0L), (0L, 1023L), (511L, 767L))
      .toDF("x", "y")
    val got = df.select(
      ZOrder.interleave($"x", $"y", 10).as("a"),
      expr(ZOrder.interleaveSql("x", "y", 10)).as("b"))
      .as[(Long, Long)].collect()
    assert(got.forall { case (a, b) => a == b },
      s"Column vs SQL fragment drift: ${got.toSeq}")
    assert(got(0)._1 == 7L)       // x=0b11 -> bits 0,2 ; y=0b1 -> bit 1
    assert(got(1)._1 == 0L)
    assert(got(2)._1 == 349525L)  // 0b0101...01 (x fills even bits)
    assert(got(3)._1 == 699050L)  // 0b1010...10 (y fills odd bits)
  }
}
