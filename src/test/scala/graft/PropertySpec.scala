package graft

import graft.functions.HashEmbed
import graft.graph.Bfs
import graft.hybrid.HybridSearch
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties (SURVEY §5c): embedding invariants, fusion
  * linearity, top-k prefix soundness, BFS depth monotonicity.
  * (scalatestplus bridge unavailable offline → seeded Gen sampling.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic samples from a generator (fixed seed → reproducible). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0).map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .collect { case Some(a) => a }.take(n).toSeq

  private def forAll[A](g: Gen[A], n: Int = 30)(f: A => Unit): Unit =
    samples(g, n).foreach(f)
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(f: (A, B) => Unit): Unit =
    samples(Gen.zip(ga, gb), n).foreach { case (a, b) => f(a, b) }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.listOf(word).map(_.mkString(" "))

  test("hash_embed: unit or zero norm, deterministic, token-order invariant") {
    forAll(textGen) { text =>
      val v = HashEmbed.encode(text, 64)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6 || n == 0.0)
      assert(v.toSeq == HashEmbed.encode(text, 64).toSeq)
      val shuffled = text.split("\\s+").reverse.mkString(" ")
      assert(HashEmbed.encode(shuffled, 64).toSeq == v.toSeq,
        "bucket counts are token-order invariant")
    }
  }

  test("hash_embed cosine bounded in [-eps, 1+eps] (non-negative vectors → [0,1])") {
    forAll2(textGen, textGen, 30) { (a, b) =>
      val va = HashEmbed.encode(a, 64)
      val vb = HashEmbed.encode(b, 64)
      val dot = va.zip(vb).map { case (x, y) => x.toDouble * y }.sum
      assert(dot >= -1e-9 && dot <= 1.0 + 1e-9)
    }
  }

  test("fusion linearity + bounds for random weights/scores (5 samples)") {
    val scoreGen = Gen.listOfN(6, Gen.choose(0.0, 1.0))
    val wGen = Gen.choose(0.0, 1.0)
    forAll2(Gen.zip(scoreGen, scoreGen), wGen, 5) { case ((vs, gs), vw) =>
      val gw = 1.0 - vw
      val nodes = (1 to 6).map(i => s"n$i").toDF("id")
      val vec = vs.zipWithIndex.map { case (s, i) => (s"n${i + 1}", s) }
        .toDF("id", "vector_score")
      val g = gs.zipWithIndex.map { case (s, i) => (s"n${i + 1}", s) }
        .toDF("id", "graph_score")
      val out = HybridSearch.fuse(nodes, vec, Some(g), vw, gw, 10)
        .select($"vec_norm", $"graph_score", $"final_score")
        .as[(Double, Double, Double)].collect()
      out.foreach { case (vn, gsc, f) =>
        assert(math.abs(f - (vw * vn + gw * gsc)) < 1e-9)
        assert(vn >= 0.0 && vn <= 1.0, "min-max normalization bounds")
        assert(f > 0.0, "final>0 filter")
      }
    }
  }

  test("top-k is a prefix of the full sort (5 samples)") {
    forAll(Gen.listOfN(30, Gen.choose(0.0, 100.0)), 5) { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
      val full = df.orderBy($"x".desc, $"id").as[(Long, Double)].collect().toSeq
      val topk = df.orderBy($"x".desc, $"id").limit(7).as[(Long, Double)].collect().toSeq
      assert(topk == full.take(7))
    }
  }

  test("BFS depth monotonicity: deeper traversals only add nodes (5 samples)") {
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0, 6), Gen.choose(0, 6), Gen.choose(0.5, 2.0)))
    forAll(edgeGen, 5) { es =>
      val edges = es.map { case (s, t, w) => (s.toLong, t.toLong, "t", w) }
        .toDF("src", "dst", "etype", "weight")
      val d1 = Bfs.traverse(edges, lit(0L), depth = 1)
        .select($"node", $"dist").as[(Long, Int)].collect().toMap
      val d3 = Bfs.traverse(edges, lit(0L), depth = 3)
        .select($"node", $"dist").as[(Long, Int)].collect().toMap
      d1.foreach { case (n, dist) =>
        assert(d3.contains(n) && d3(n) == dist,
          s"distances stable under deeper traversal: $n")
      }
      assert(d1.size <= d3.size)
    }
  }

  test("histogramQuantiles: est-exact in (0, width], exact == sorted rank (5 samples)") {
    val valuesGen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 5000L)),
      Gen.chooseNum(7L, 400L))
    forAll(valuesGen, n = 5) { case (xs, width) =>
      val df = xs.toDF("x")
      val qs = Seq((1, 3), (1, 2), (9, 10))
      val r = pipeline.Sketches.histogramQuantiles(df, "x", width, qs)
        .as[(Int, Int, Long, Long, Long, Long)].collect()
      assert(r.length == qs.size)
      val sorted = xs.sorted
      r.foreach { case (num, den, rank, exact, est, err) =>
        assert(rank == (xs.size.toLong * num + den - 1) / den)
        assert(exact == sorted((rank - 1).toInt),
          s"$num/$den exact $exact != ${sorted((rank - 1).toInt)} (w=$width)")
        assert(err == est - exact && err >= 1 && err <= width,
          s"$num/$den err $err outside (0, $width]")
      }
    }
  }

  test("allPairsJaccard == brute force on random small corpora (4 samples)") {
    // tiny vocab → heavy shingle collisions → the filters get exercised
    val tok = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.listOfN(8, tok).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(12, doc)
    forAll(corpusGen, n = 4) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = pipeline.Dedup.allPairsJaccard(df, "doc_id", "text", 2, 3)
        .select($"a", $"b", $"inter", $"uni")
        .as[(Long, Long, Int, Int)].collect().toSet
      val sh = df.select($"doc_id",
          pipeline.TextOps.shingles(pipeline.TextOps.tokens($"text")).as("shs"))
        .filter(size($"shs") > 0)
      val brute = sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
        .withColumn("inter", size(array_intersect(col("x.shs"), col("y.shs"))))
        .withColumn("uni", size(col("x.shs")) + size(col("y.shs")) - col("inter"))
        .filter(col("inter") * 3 >= col("uni") * 2)
        .select(col("x.doc_id"), col("y.doc_id"), col("inter"), col("uni"))
        .as[(Long, Long, Int, Int)].collect().toSet
      assert(got == brute,
        s"missed=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
    }
  }
}
