package graft

import graft.search.Bm25

object Bm25Spec {
  /** Incremented every time the source corpus RDD is evaluated — proves
    * whether a search re-tokenizes (local mode: one shared JVM). */
  val sourceScans = new java.util.concurrent.atomic.AtomicInteger(0)
}

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("built index searches without re-scanning the corpus; results == one-shot") {
    val rows = Seq((1L, "spark shuffle join"), (2L, "spark spark streaming"),
      (3L, "graph traversal depth"))
    val docs = spark.sparkContext.parallelize(rows, 2)
      .map { r => Bm25Spec.sourceScans.incrementAndGet(); r }
      .toDF("doc_id", "text")
    val oneShot = Bm25.score(docs, "doc_id", "text", Seq("spark"), 10)
      .as[(Long, Double)].collect().toMap

    val index = Bm25.build(docs, "doc_id", "text")
    val after = Bm25Spec.sourceScans.get()
    val s1 = Bm25.search(index, Seq("spark"), 10).as[(Long, Double)].collect().toMap
    val s2 = Bm25.search(index, Seq("traversal"), 10).as[(Long, Double)].collect().toMap
    assert(Bm25Spec.sourceScans.get() == after,
      "searches on a built index must not launch tokenization/corpus jobs")
    assert(s1 == oneShot, "index-path results identical to one-shot path")
    assert(s2.keySet == Set(3L))
  }

  test("saved index reloads and searches identically (durable warm start)") {
    import graft.search.Bm25Index
    val docs = Seq((1L, "spark shuffle join"), (2L, "spark spark streaming"),
      (3L, "graph traversal depth")).toDF("doc_id", "text")
    val built = Bm25.build(docs, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    built.save(dir)
    val loaded = Bm25Index.load(spark, dir)
    assert(loaded.n == built.n && loaded.avgdl == built.avgdl)
    val a = Bm25.search(built, Seq("spark", "graph"), 10).as[(Long, Double)].collect().toMap
    val b = Bm25.search(loaded, Seq("spark", "graph"), 10).as[(Long, Double)].collect().toMap
    assert(a == b, s"$a vs $b")
  }

  // Hand-computed BM25Okapi (rank_bm25 0.2.2 semantics) on a 3-doc corpus.
  test("bm25 closed form matches hand computation (k1=1.5, b=0.75, eps=0.25)") {
    val docs = Seq(
      (1L, "spark shuffle join"),
      (2L, "spark spark streaming"),
      (3L, "graph traversal depth")).toDF("doc_id", "text")

    // corpus: N=3, dls = 3,3,3, avgdl = 3
    // term 'spark': df=2 → idf = ln((3-2+0.5)/(2+0.5)) = ln(0.6) < 0
    // all other terms: df=1 → idf = ln((3-1+0.5)/(1+0.5)) = ln(5/3)
    // avg_idf over 7 distinct terms = (ln(0.6) + 6*ln(5/3))/7; eps floor = 0.25*avg
    val lnPos = math.log(2.5 / 1.5)
    val lnNeg = math.log(1.5 / 2.5)
    val avgIdf = (lnNeg + 6 * lnPos) / 7
    val idfSpark = 0.25 * avgIdf
    def tfTerm(tf: Double, dl: Double): Double =
      tf * 2.5 / (tf + 1.5 * (1.0 - 0.75 + 0.75 * dl / 3.0))

    val expected1 = idfSpark * tfTerm(1, 3) // doc1: 'spark' x1
    val expected2 = idfSpark * tfTerm(2, 3) // doc2: 'spark' x2

    val got = Bm25.score(docs, "doc_id", "text", Seq("spark"), 10)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L), s"score>0 filter: $got")
    assert(math.abs(got(1L) - expected1) < 1e-6, s"${got(1L)} vs $expected1")
    assert(math.abs(got(2L) - expected2) < 1e-6, s"${got(2L)} vs $expected2")
  }

  test("bm25 multi-term query sums per-term contributions; zero-hit docs dropped") {
    val docs = Seq(
      (1L, "spark shuffle join"),
      (2L, "window functions"),
      (3L, "join order")).toDF("doc_id", "text")
    val got = Bm25.score(docs, "doc_id", "text", Seq("join", "shuffle"), 10)
      .as[(Long, Double)].collect().toMap
    assert(got.contains(1L) && got.contains(3L) && !got.contains(2L))
    assert(got(1L) > got(3L), "doc1 matches both terms")
  }
}
