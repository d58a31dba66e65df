package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables(spark, sf, "documents")

  test("exact dedup finds planted copies and nothing else") {
    val corpus = docs.select($"doc_id", $"text").unionByName(
      docs.filter($"doc_id" < 15).select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val groups = Dedup.exactGroups(corpus, "doc_id", "text")
      .filter($"n" > 1).collect()
    assert(groups.length == 15)
    assert(groups.forall(_.getAs[Long]("n") == 2))
  }

  test("gopherFilter: every rule discriminates; flags are pure integer recomputes") {
    val g = TextAnalysis.gopherFilter(docs, "doc_id", "text")
      .select($"doc_id", $"n_words", $"n_distinct", $"sum_wlen", $"n_stop",
        $"r_wc", $"r_mwl", $"r_rep", $"r_stop", $"keep")
      .as[(Long, Int, Int, Long, Int, Int, Int, Int, Int, Int)].collect()
    assert(g.length == docs.count())
    // no rule is vacuous on the fixture: each passes some docs, fails others
    for ((name, f) <- Seq[(String, ((Long, Int, Int, Long, Int, Int, Int, Int, Int, Int)) => Int)](
        "r_wc" -> (_._6), "r_mwl" -> (_._7), "r_rep" -> (_._8), "r_stop" -> (_._9))) {
      val passed = g.count(f(_) == 1)
      assert(passed > 0 && passed < g.length,
        s"$name must discriminate on the fixture: $passed/${g.length}")
    }
    // keep is exactly the conjunction, and strictly between 0 and all
    assert(g.forall(r => r._10 == r._6 * r._7 * r._8 * r._9))
    val kept = g.count(_._10 == 1)
    assert(kept > 0 && kept < g.length, s"keep must mix: $kept/${g.length}")
    // flags are deterministic integer functions of the counted stats
    g.foreach { r =>
      assert(r._6 == (if (r._2 >= 30 && r._2 <= 80) 1 else 0))
      assert(r._7 == (if (10L * r._4 >= 40L * r._2 && 10L * r._4 <= 50L * r._2) 1 else 0))
      assert(r._8 == (if (20L * r._3 >= 9L * r._2) 1 else 0))
      assert(r._9 == (if (r._5 >= 2) 1 else 0))
    }
  }

  test("water-filling quota: budget exact, under-quota groups full, picks match") {
    val rows = rel.PipelineQueries.mixWaterfill.run(spark, sf)
      .select($"lang", $"n_docs", $"is_full", $"alloc", $"n_picked")
      .as[(String, Long, Int, Long, Long)].collect()
    assert(rows.map(_._4).sum == 400L, s"Σ alloc must equal the budget: ${rows.toSeq}")
    rows.foreach { r =>
      if (r._3 == 1) assert(r._4 == r._2, s"under-quota group must keep all: $r")
      else assert(r._4 < r._2, s"over-quota group must be capped: $r")
      assert(r._5 == r._4, s"selection must deliver exactly the allocation: $r")
    }
    assert(rows.exists(_._3 == 0) && rows.exists(_._3 == 1),
      "fixture must exercise both sides of the cap")
  }

  test("Audit.sample is ABSOLUTE-size: constant as the corpus grows") {
    val emb = Tables(spark, sf, "embeddings")
    val n = rel.PipelineQueries.AuditN
    val small = Audit.sample(emb, "vec_id", n)
    // 4x the corpus (disjoint ids) — the sample size must NOT move
    val big = emb.select($"vec_id", $"embedding", $"label").unionByName(
      (1 to 3).map(i => emb.select(($"vec_id" + i * 1000000).as("vec_id"),
        $"embedding", $"label")).reduce(_ unionByName _))
    assert(small.count() == n.toLong)
    assert(Audit.sample(big, "vec_id", n).count() == n.toLong,
      "fixed-fraction samples scale with the corpus; Audit.sample must not")
    // deterministic: same rows in the same order on re-evaluation
    val ids = small.select($"vec_id").as[Long].collect().toSeq
    assert(ids == Audit.sample(emb, "vec_id", n)
      .select($"vec_id").as[Long].collect().toSeq)
  }

  test("label propagation: planted copies adopt originals, seeds clamped") {
    val rows = rel.PipelineQueries.vecLabelprop.run(spark, sf)
      .select($"is_seed", $"is_copy", $"pred", $"truth", $"correct")
      .as[(Int, Int, Int, Int, Int)].collect()
    // seeds are clamped to their own labels, trivially correct
    assert(rows.filter(_._1 == 1).forall(r => r._3 == r._4 && r._5 == 1))
    // EVERY planted exact copy adopts its original's label in round 1 —
    // the cos-1.0 edge must dominate any noise vote (weighted LP's point)
    val copies = rows.filter(_._2 == 1)
    assert(copies.nonEmpty && copies.forall(_._5 == 1),
      s"copies must follow originals: ${copies.count(_._5 == 1)}/${copies.length}")
    // the symmetrized 5-NN graph reaches everything in 2 rounds here
    assert(rows.forall(_._3 != -1))
  }

  test("nprobe curve is monotone non-decreasing; hubness histogram conserves votes") {
    // nested candidate sets ⇒ recall@5 can only grow with nprobe
    val curve = rel.PipelineQueries.annNprobeCurve.run(spark, sf)
      .select($"nprobe", $"n_hit").as[(Int, Long)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1, 2, 4))
    assert(curve.sliding(2).forall(p => p(0)._2 <= p(1)._2),
      s"recall must be non-decreasing in nprobe: ${curve.toSeq}")
    // each sample point casts exactly 5 neighbour votes: Σ occ·n = 5·|S|,
    // Σ n = |S| (antihubs included via the left join)
    val hist = rel.PipelineQueries.vecHubness.run(spark, sf)
      .select($"occ", $"n_points").as[(Long, Long)].collect()
    val nSample = math.min(rel.PipelineQueries.AuditN.toLong,
      Tables(spark, sf, "embeddings").count())
    assert(hist.map(_._2).sum == nSample)
    assert(hist.map(r => r._1 * r._2).sum == 5L * nSample,
      s"vote conservation: ${hist.toSeq}")
  }

  test("minhash-LSH finds every planted near-copy pair with high est-jaccard") {
    val corpus = docs.select($"doc_id", $"text").unionByName(
      docs.filter($"doc_id" < 20)
        .select(($"doc_id" + 100000).as("doc_id"),
          concat($"text", lit(" qq17 zz88")).as("text")))
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    val planted = pairs.filter { case (a, b, _) => b == a + 100000 }
    assert(planted.length == 20, s"recall on planted pairs: ${planted.length}/20")
    assert(planted.forall(_._3 >= 0.5))
  }

  test("BPE: merges deterministic; budgets diverge from whitespace proxy") {
    val (merges, vocab) = Bpe.train(docs, "text", numMerges = 8)
    val m = merges.as[(Int, String, Long)].collect().sortBy(_._1)
    assert(m.length == 8 && m.map(_._1).toSeq == (1 to 8), m.mkString(","))
    assert(m.forall(_._3 >= 1))
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", vocab)
    // the mandate's point: BPE budgets are NOT the whitespace numbers
    assert(counts.filter($"bpe_tokens" =!= $"ws_tokens").count() > 0)
    assert(counts.filter($"bpe_tokens" < $"ws_tokens").count() == 0,
      "a word is never fewer than one piece")
    // more merges ⇒ strictly smaller corpus token budget
    val t8 = counts.agg(sum($"bpe_tokens")).as[Long].head()
    val (_, vocab2) = Bpe.train(docs, "text", numMerges = 2)
    val t2 = Bpe.tokenCounts(docs, "doc_id", "text", vocab2)
      .agg(sum($"bpe_tokens")).as[Long].head()
    assert(t8 < t2, s"8-merge budget $t8 !< 2-merge budget $t2")
    // out-of-vocab words fall back to per-character pieces
    val unk = Seq((9L, "zzqqxxy")).toDF("doc_id", "text")
    val u = Bpe.tokenCounts(unk, "doc_id", "text", vocab)
      .as[(Long, Long, Long)].head()
    assert(u == ((9L, 1L, 7L)), s"$u")
    // training greedy-merge overlap semantics: 'aaa' under merge (a,a) → [aa, a]
    val tiny = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val (tm, tv) = Bpe.train(tiny, "text", numMerges = 1)
    assert(tm.as[(Int, String, Long)].head()._2 == "a a")
    assert(tv.select($"state").as[String].head() == " aa a ")
  }

  test("substring dedup: offset-shifted clones caught; fixed segments miss them") {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"u$i").mkString(" ")
    val d = Seq(
      (1L, base),                 // original
      (2L, "p1 p2 p3 " + base),   // same 40-token span at offset 3
      (3L, other))                // unrelated
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(d, "doc_id", "text", k = 20)
      .select($"doc_id", $"n_toks", $"n_dup_toks", $"cleaned")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // every 20-window of doc 1 occurs in doc 2 ⇒ doc 1 fully covered
    assert(out(1L)._3 == 40L, s"doc 1 dup tokens: ${out(1L)._3}")
    assert(out(1L)._4 == org.apache.commons.codec.digest.DigestUtils.md5Hex(""))
    // doc 2: the shared span covered, the 3 pad tokens survive
    assert(out(2L)._3 == 40L && out(2L)._2 == 43L)
    assert(out(2L)._4 == org.apache.commons.codec.digest.DigestUtils.md5Hex("p1 p2 p3"))
    assert(out(3L)._3 == 0L, "unrelated doc untouched")
    // fixed 10-token segments NEVER collide at offset 3 — the structural
    // miss rolling windows exist to close
    val seg = Dedup.segmentCleanse(d, "doc_id", "text", segLen = 10, minDocs = 2)
      .select($"doc_id", $"n_seg", $"n_kept").as[(Long, Long, Long)].collect()
    seg.foreach { case (id, nSeg, nKept) =>
      assert(nSeg == nKept, s"fixed segments should miss offset dups (doc $id)")
    }
  }

  test("winnowing: offset-shifted pair guaranteed; selection really thins") {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"u$i").mkString(" ")
    val d = Seq(
      (1L, base),                 // original
      (2L, "p1 p2 p3 " + base),   // same 40-token span at offset 3
      (3L, other))                // unrelated
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(d, "doc_id", "text", k = 8, w = 4)
      .as[(Long, Long, Long)].collect()
    // the winnowing guarantee: a shared span of ≥ k+w-1 tokens MUST
    // surface the pair, regardless of the 3-token offset
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the clone pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= 2L)
    // selection thins the join input: selected fingerprints per doc must
    // be well under the raw window count (40-8+1 = 33 windows; density
    // bound for w=4 is ~2/(w+1) plus boundary effects)
    assert(pairs.head._3 <= 20L,
      s"winnowing must select far fewer than 33 windows: ${pairs.head._3}")
    // robustness to ANY offset: shifting by 7 instead of 3 still pairs
    val d2 = Seq((1L, base), (2L, (200 until 207).map(i => s"x$i").mkString(" ") + " " + base))
      .toDF("doc_id", "text")
    val p2 = Dedup.winnowPairs(d2, "doc_id", "text", k = 8, w = 4)
      .as[(Long, Long, Long)].collect()
    assert(p2.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
  }

  test("logistic GD: separates the planted degenerate class; deterministic") {
    import graft.pipeline.Classifier
    val feat = Classifier.qualityFeatures(Tables(spark, sf, "documents"))
    val out = Classifier.trainLogReg(feat,
        names = Seq("bias", "stop_cov", "tok_len", "nonalpha"), iters = 5, lr = 2.0)
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("nonalpha")._3 >= 0.95,
      s"trained filter must separate the planted junk class: acc=${out("nonalpha")._3}")
    assert(out("nonalpha")._2 > 0.0,
      "junk docs have high non-letter fraction; its weight must be positive")
    // partition-independence of the decimal gradient sums
    val out2 = Classifier.trainLogReg(feat.repartition(7),
        names = Seq("bias", "stop_cov", "tok_len", "nonalpha"), iters = 5, lr = 2.0)
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out == out2, "weights must be bit-identical at any partitioning")
    // a perfectly separable 1-feature toy set trains to accuracy 1
    val toy = (0 until 40).map(i => (if (i % 2 == 0) 1.0 else 0.0,
      0.0, 0.0, if (i % 2 == 0) 1.0 else 0.0)).toDF("y", "x1", "x2", "x3")
    val t = Classifier.trainLogReg(toy,
        names = Seq("bias", "a", "b", "c"), iters = 5, lr = 2.0)
      .as[(String, Double, Double)].collect()
    assert(t.head._3 == 1.0, s"toy set must train to acc 1.0: ${t.toSeq}")
  }

  test("semantic dedup: planted copies pruned by their originals, clean corpus kept") {
    import graft.pipeline.{Dedup, Similarity}
    val e = Tables(spark, sf, "embeddings")
    val corpus = e.select($"vec_id", $"embedding").unionByName(
      e.filter($"vec_id" < 10)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val cent = Similarity.kmeansCentroids(e, "vec_id", "embedding", iters = 2)
    val pruned = Dedup.semanticDedup(corpus, "vec_id", "embedding", cent, tau = 0.99)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // exactly the planted copies are pruned — identical vectors always
    // share a cell, and nothing in the clean fixture reaches cos 0.99
    assert(pruned.map(_._1).toSeq == (100000L until 100010L).toSeq, pruned.toSeq.toString)
    assert(pruned.forall(p => p._2 == p._1 - 100000L && p._3 == 1.0))
  }

  test("budget dedup: duplicates share (cid,sub); hot cells split; no-op within budget") {
    import graft.pipeline.{Dedup, Similarity}
    // Skewed planted fixture: 160 vectors in ONE tight cluster around c0
    // (the hot cell a real corpus produces when it clusters hard) plus 10
    // around the orthogonal c1; deterministic splitmix-hashed residuals
    // (sinusoids are low-rank and alias against the fixed hyperplanes).
    val dim = 8
    val c0 = Seq.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    val c1 = Seq.tabulate(dim)(j => if (j == 1) 1.0 else 0.0)
    def h(i: Int, j: Int): Double = {
      var x = i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
      x ^= (x >>> 31); x *= 0x94D049BB133111EBL; x ^= (x >>> 29)
      (x & 0xFFFFFF).toDouble / 0xFFFFFF.toDouble * 2.0 - 1.0
    }
    def jitter(base: Seq[Double], i: Int): Seq[Double] =
      base.zipWithIndex.map { case (b, j) => b + 0.05 * h(i, j) }
    val hot = (0 until 160).map(i => (i.toLong, jitter(c0, i)))
    val cold = (0 until 10).map(i => (1000L + i, jitter(c1, i)))
    val copies = hot.take(12).map { case (id, v) => (10000L + id, v) } // exact dups
    val emb = (hot ++ cold ++ copies).toDF("vec_id", "embedding")
    val cent = Seq((0L, c0), (1L, c1)).toDF("cid", "cv")
    val g = Dedup.budgetGroups(emb, "vec_id", "embedding", cent,
        budget = 20L, numPlanes = 4, roundTo = 6, dim = dim)
      .select($"vid", $"cid", $"sub").as[(Long, Long, Long)].collect()
    val byId = g.map(r => r._1 -> (r._2, r._3)).toMap
    // (a) exact duplicates ALWAYS share (cid, sub) with their originals
    copies.foreach { case (cid10k, _) =>
      assert(byId(cid10k) == byId(cid10k - 10000L),
        s"copy $cid10k split from its original: ${byId(cid10k)} vs ${byId(cid10k - 10000L)}")
    }
    // (b) the over-budget hot cell splits into many residual sub-buckets,
    // each bounded near the budget; the within-budget cold cell stays sub=0
    val hotGroups = g.filter(_._2 == 0L).groupBy(_._3).view.mapValues(_.length).toMap
    assert(hotGroups.size >= 8, s"residual LSH must spread the hot cell: $hotGroups")
    val maxGroup = hotGroups.values.max
    assert(maxGroup <= 40, // 2× budget on 172 rows / 16 sub-buckets
      s"per-(cid,sub) volume must be bounded near the budget: max=$maxGroup in $hotGroups")
    assert(g.filter(_._2 == 1L).forall(_._3 == 0L),
      "cells within the budget must keep sub=0 (identical to semanticDedup)")
    // (c) with no cell over budget the operator IS semanticDedup
    val e = Tables(spark, sf, "embeddings")
    val corpus = e.select($"vec_id", $"embedding").unionByName(
      e.filter($"vec_id" < 10)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val trained = Similarity.kmeansCentroids(e, "vec_id", "embedding", iters = 2)
    val base = Dedup.semanticDedup(corpus, "vec_id", "embedding", trained, tau = 0.99)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val budgeted = Dedup.semanticDedupBudget(corpus, "vec_id", "embedding", trained,
        tau = 0.99, budget = Long.MaxValue)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(budgeted == base, "budget=∞ must reproduce semanticDedup exactly")
  }

  test("classifier eval: AUC near 1 on the separable plant; curve is coherent") {
    import graft.pipeline.Classifier
    val feat = Classifier.qualityFeatures(Tables(spark, sf, "documents"))
    val rows = Classifier.evalSweep(feat, iters = 5, lr = 2.0)
      .select($"thr", $"tp", $"fp", $"fn", $"tn", $"recall", $"auc")
      .as[(Double, Long, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.length == 9)
    val auc = rows.head._7
    assert(auc >= 0.95, s"separable planted classes must give AUC≈1, got $auc")
    // confusion identities: tp+fn and fp+tn are the class totals at every θ
    val npos = rows.head._2 + rows.head._4
    val nneg = rows.head._3 + rows.head._5
    assert(rows.forall(r => r._2 + r._4 == npos && r._3 + r._5 == nneg))
    // recall is non-increasing in the threshold
    assert(rows.sliding(2).forall(p => p(0)._6 >= p(1)._6))
    // partition-independence: the exact-integer AUC numerator discipline
    val rows2 = Classifier.evalSweep(feat.repartition(7), iters = 5, lr = 2.0)
      .select($"thr", $"tp", $"fp", $"fn", $"tn", $"recall", $"auc")
      .as[(Double, Long, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == rows2.toSeq)
  }

  test("PMI: a planted always-adjacent collocation is the only and top pair") {
    // "nx yk" always adjacent (3×, passes the c12 ≥ 3 floor); every other
    // adjacency occurs once or twice, so the ranked output is exactly it
    val d = Seq((1L, "i love nx yk"), (2L, "nx yk is big"),
        (3L, "visit nx yk now"), (4L, "the cat sat"), (5L, "the dog ran"))
      .toDF("doc_id", "text").createOrReplaceTempView("pmi_docs")
    import graft.pipeline.TextOps
    val docs = spark.table("pmi_docs")
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
    val uni = docs.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum($"c")).as[Long].head()
    val bg = docs.select($"toks",
        posexplode(slice($"toks", lit(1), greatest(size($"toks") - 1, lit(0)))))
      .select($"col".as("w1"), element_at($"toks", $"pos" + 2).as("w2"))
    val pair = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val m = pair.agg(sum($"c12")).as[Long].head()
    val top = pair.filter($"c12" >= 3)
      .join(uni.select($"w".as("w1"), $"c".as("c1")), Seq("w1"))
      .join(uni.select($"w".as("w2"), $"c".as("c2")), Seq("w2"))
      .select(concat($"w1", lit(" "), $"w2").as("bigram"),
        log(($"c12".cast("double") * n * n) / (lit(m.toDouble) * $"c1" * $"c2")).as("pmi"))
      .collect()
    assert(top.length == 1 && top.head.getString(0) == "nx yk", top.mkString(","))
    // PMI of a perfect collocation with count c: ln(N²/(M·c)) — positive here
    assert(top.head.getDouble(1) > 0.0)
  }

  test("rolling window hash: compiled kernel equals the mod-P polynomial of strHash") {
    val toks = Seq("alpha", "beta", "gamma", "delta", "echo")
    val k = 3
    val hv = Seq(toks).toDF("toks")
      .select(explode(transform($"toks", t => TextOps.strHash(t))))
      .as[Long].collect()
    val coef = Array.iterate(1L, k)(c => (c * 131L) % TextOps.P)
    val expected = (0 to toks.length - k).map { j =>
      (0 until k).map(o => (hv(j + o) * coef(o)) % TextOps.P).sum % TextOps.P
    }
    val got = Seq(toks).toDF("toks")
      .select(graft.functions.text.windowHashes($"toks", k))
      .as[Seq[Long]].head()
    assert(got == expected, s"$got vs $expected")
    // fewer than k tokens ⇒ empty array, not null
    val short = Seq(Seq("a", "b")).toDF("toks")
      .select(graft.functions.text.windowHashes($"toks", k))
      .as[Seq[Long]].head()
    assert(short == Seq.empty)
  }

  test("band keys: weighted-sum-colliding bands get distinct md5 keys") {
    // two bands with DIFFERENT contents but the same Σ(i%4+1)·mh = 300 —
    // the pre-r5 weighted-sum key would have made these spurious candidates
    val mh = Seq(
      (1L, 0, 10L), (1L, 1, 20L), (1L, 2, 30L), (1L, 3, 40L),   // 10+40+90+160
      (2L, 0, 100L), (2L, 1, 100L), (2L, 2, 0L), (2L, 3, 0L),   // 100+200+0+0
      (3L, 0, 10L), (3L, 1, 20L), (3L, 2, 30L), (3L, 3, 40L))   // == doc 1
      .toDF("doc_id", "i", "mh")
    val keys = Dedup.bandKeys(mh, rowsPerBand = 4)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    assert(keys(1) != keys(2), "distinct band contents must get distinct keys")
    assert(keys(1) == keys(3), "identical band contents must get equal keys")
  }

  test("simhash: near-dup texts within small hamming distance, unrelated far") {
    val d = Seq(
      (1L, "spark shuffle join window aggregate filter scan merge sort"),
      (2L, "spark shuffle join window aggregate filter scan merge sorted"),
      (3L, "completely different topic gardening flowers spring soil")).toDF("doc_id", "text")
    val sh = Dedup.simhash(d, "doc_id", "text").as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)),
      s"near-dup must be closer: ${sh.toSeq}")
  }

  test("lsh ANN: same-bucket recall vs brute force on bucket-mates") {
    val e = Tables(spark, sf, "embeddings")
    val got = Similarity.lshTopK(e, e.filter($"vec_id" < 5), "vec_id", "embedding", k = 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    // every query finds itself at rank 1 (cosine 1.0 within its own bucket)
    val self = got.filter(r => r._1 == r._2)
    assert(self.length == 5 && self.forall(_._4 == 1), s"${self.toSeq}")
  }

  test("multi-probe LSH recall >= single-probe recall vs brute force") {
    val e = Tables(spark, sf, "embeddings")
    val queries = e.filter($"vec_id" < 5)
    def hits(radius: Int): Map[Long, Set[Long]] =
      Similarity.lshTopK(e, queries, "vec_id", "embedding", k = 5, probeRadius = radius)
        .as[(Long, Long, Double, Int)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = VectorSearchBrute.topkPerQuery(spark, e, k = 5)
    val single = hits(0)
    val multi = hits(1)
    val recallS = recall(single, brute)
    val recallM = recall(multi, brute)
    info(f"recall single-probe $recallS%.2f, multi-probe $recallM%.2f")
    assert(recallM >= recallS)
    assert(multi.forall { case (q, cs) => cs.size == 5 })
  }

  private def recall(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double =
    exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size

  private object VectorSearchBrute {
    def topkPerQuery(s: org.apache.spark.sql.SparkSession,
                     e: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Set[Long]] = {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val q = e.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qv"))
      val c = e.select($"vec_id".as("cid"), $"embedding".as("cv"))
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
      c.join(broadcast(q))
        .withColumn("cos", round(graft.functions.vec.cosine($"cv", $"qv"), 6))
        .withColumn("rn", row_number().over(w)).filter($"rn" <= k)
        .select($"qid", $"cid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }
  }

  test("embedding LSH dedup: planted copies found; verified cos == exact all-pairs cos") {
    val e = Tables(spark, sf, "embeddings")
    val corpus = e.select($"vec_id", $"embedding").unionByName(
      e.filter($"vec_id" < 10)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val lsh = Dedup.embeddingCosineLsh(corpus, "vec_id", "embedding", topK = 25)
      .as[(Long, Long, Double)].collect()
    val planted = lsh.filter { case (a, b, _) => b == a + 100000 }
    assert(planted.length == 10, s"planted recall ${planted.length}/10")
    assert(planted.forall(_._3 >= 0.999999), s"${planted.toSeq}")
    // the verify step must score candidates identically to the exact baseline
    val ids = lsh.flatMap(t => Seq(t._1, t._2)).distinct.toSeq
    val exact = Dedup.embeddingCosinePairs(
        corpus.filter($"vec_id".isin(ids: _*)), "vec_id", "embedding",
        topK = ids.length * ids.length)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    lsh.foreach { case (a, b, c) => assert(exact((a, b)) == c, s"($a,$b)") }
  }

  test("lsh ANN derives hyperplane dim from the corpus (256-dim self-recall)") {
    val e = Tables(spark, sf, "embeddings")
    val vd = $"embedding".cast("array<double>")
    val e256 = e.select($"vec_id",
      concat(vd, reverse(vd), transform(vd, x => x / 2.0),
        transform(vd, x => -x)).as("v"))
    val got = Similarity.lshTopK(e256, e256.filter($"vec_id" < 5), "vec_id", "v", k = 5)
      .as[(Long, Long, Double, Int)].collect()
    val self = got.filter(r => r._1 == r._2)
    assert(self.length == 5 && self.forall(_._4 == 1), s"${self.toSeq}")
  }

  test("multimodal: mapPartitions feature extraction matches SQL-computable facts") {
    val media = Multimodal.mediaFromDocuments(docs.limit(10)).as[MediaRow]
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 10)
    val byId = feats.map(f => f.doc_id -> f).toMap
    val raw = docs.limit(10).select($"doc_id", $"text").as[(Long, String)].collect()
    raw.foreach { case (id, text) =>
      assert(byId(id).n_bytes == text.getBytes("UTF-8").length)
      assert(byId(id).digest.length == 32)
      assert(byId(id).format == "text/plain")
    }
  }

  test("image decode: real imageio round-trip; corrupt/non-image stay byte-only") {
    val media = Seq(
      MediaRow(1L, Multimodal.pngPayload(12, 7), "image/png", "t"),
      MediaRow(2L, "not an image".getBytes("UTF-8"), "text/plain", "t"),
      MediaRow(3L, "garbage bytes".getBytes("UTF-8"), "image/png", "t")).toDS()
    val f = Multimodal.extractFeatures(media).collect().map(x => x.doc_id -> x).toMap
    assert(f(1L).width.contains(12) && f(1L).height.contains(7), s"${f(1L)}")
    assert(f(2L).width.isEmpty && f(2L).height.isEmpty, "non-image: no decode")
    assert(f(3L).width.isEmpty, "corrupt image payload degrades to None, not a crash")
    assert(f.values.forall(_.digest.length == 32), "byte features always present")
  }

  test("audio decode: real javax.sound round-trip; corrupt payload -1, not a crash") {
    val media = Seq(
      MediaRow(1L, Multimodal.wavPayload(8000, 1600, 1), "audio/wav", "t"),
      MediaRow(2L, Multimodal.wavPayload(44100, 441, 2), "audio/wav", "t"),
      MediaRow(3L, "definitely not audio".getBytes("UTF-8"), "audio/wav", "t")).toDS()
    val f = Multimodal.extractAudioFeatures(media).collect()
      .map(x => x.doc_id -> x).toMap
    assert(f(1L).sample_rate == 8000 && f(1L).channels == 1 &&
      f(1L).n_frames == 1600L && f(1L).duration_ms == 200L, s"${f(1L)}")
    assert(f(2L).sample_rate == 44100 && f(2L).channels == 2 &&
      f(2L).n_frames == 441L && f(2L).duration_ms == 10L, s"${f(2L)}")
    assert(f(3L).sample_rate == -1 && f(3L).duration_ms == -1L,
      "corrupt audio degrades to sentinels, not a crash")
    assert(f.values.forall(_.digest.length == 32), "byte features always present")
  }

  test("video decode: MJPEG marker-walk finds exact frames; real per-frame decode") {
    val media = Seq(
      MediaRow(1L, Multimodal.mjpegPayload(16, 16, 5, seed = 3L),
        "video/x-motion-jpeg", "t"),
      MediaRow(2L, Multimodal.mjpegPayload(16, 16, 5, seed = 3L),
        "video/x-motion-jpeg", "t"), // byte-identical twin
      MediaRow(3L, "definitely not a video".getBytes("UTF-8"),
        "video/x-motion-jpeg", "t")).toDS()
    val frames = Multimodal.videoFrames(media).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(frames(1L).length == 5, "splitter must find exactly the encoded frames")
    assert(frames(1L).forall(f => f.width == 16 && f.height == 16),
      "per-frame decode is real (ImageIO dims)")
    assert(frames(1L).map(_.ahash).toSeq == frames(2L).map(_.ahash).toSeq,
      "identical streams decode to identical perceptual hashes")
    assert(frames(1L).map(_.ahash).distinct.length == 5,
      "noise frames must not alias under aHash")
    assert(!frames.contains(3L), "no JPEG EOI marker -> zero frames, no crash")
    // sampling every 2nd frame keeps indices 0,2,4
    val sampled = Multimodal.videoFrames(
      media.filter(_.doc_id == 1L), sampleEvery = 2).collect()
    assert(sampled.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4))
    // extractFeatures decodes first-frame dims for the video format
    val feat = Multimodal.extractFeatures(media).collect()
      .map(x => x.doc_id -> x).toMap
    assert(feat(1L).width.contains(16) && feat(1L).height.contains(16))
    assert(feat(3L).width.isEmpty)
  }

  test("MJPEG splitter skips length-prefixed segments containing raw EOI bytes") {
    // A legal JPEG may carry 0xFF 0xD9 inside an APPn/EXIF payload; the
    // splitter must skip those segments by declared length instead of
    // byte-scanning them (a raw EOI scan cuts the frame early).
    val frame = Multimodal.mjpegPayload(16, 16, 1, seed = 9L)
    assert(frame(0) == 0xFF.toByte && frame(1) == 0xD8.toByte, "fixture is a JPEG")
    // inject APP1 right after SOI whose 8-byte body embeds FF D9 and FF D8
    val body = Array(0x45, 0x78, 0xFF, 0xD9, 0xFF, 0xD8, 0x00, 0x01)
      .map(_.toByte)
    val app1 = Array(0xFF.toByte, 0xE1.toByte, 0x00.toByte,
      (body.length + 2).toByte) ++ body
    val poisoned = frame.take(2) ++ app1 ++ frame.drop(2)
    val stream = poisoned ++ poisoned ++ poisoned
    val split = Multimodal.splitMjpegFrames(stream)
    assert(split.length == 3,
      s"APPn body bytes must not terminate a frame: got ${split.length}")
    assert(split.forall(_.sameElements(poisoned)), "frame boundaries exact")
    // the poisoned frames still decode (ImageIO skips unknown APP1)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(split.head))
    assert(img != null && img.getWidth == 16)
  }

  test("frame sampling: byte chunks reassemble to the payload; resize truncates") {
    val media = Multimodal.mediaFromDocuments(docs.limit(5)).as[MediaRow]
    val frames = Multimodal.frameSample(media, frameSize = 64).collect()
      .groupBy(_.doc_id)
    val raw = docs.limit(5).select($"doc_id", $"text").as[(Long, String)].collect()
    raw.foreach { case (id, text) =>
      val fs = frames(id).sortBy(_.frame_idx)
      assert(fs.map(_.n_bytes).sum == text.getBytes("UTF-8").length,
        "chunks cover the payload exactly")
      assert(fs.init.forall(_.n_bytes == 64) || fs.length == 1)
      assert(fs.map(_.frame_idx).toSeq == fs.indices.toSeq)
    }
    val resized = Multimodal.resizeStub(media, maxBytes = 100).collect()
    assert(resized.forall(_.payload.length <= 100))
  }

  test("phash: 1-pixel perturbation stays near-dup and the band join recalls it") {
    // base image + a copy with ONE pixel blasted to white: visually a
    // near-duplicate, so aHash must move only a few bits (not 0 — the
    // touched cell flips) and the 4-band LSH join must still recall it
    val base = Multimodal.noisyPngPayload(16, 16, seed = 5L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    img.setRGB(9, 9, 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val perturbed = out.toByteArray

    val h1 = Multimodal.aHash64(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(base)))
    val h2 = Multimodal.aHash64(img)
    val hd = java.lang.Long.bitCount(h1 ^ h2)
    assert(hd >= 0 && hd <= 3, s"1-pixel edit moved $hd aHash bits")

    // unrelated seeds are far in Hamming space (decorrelation property)
    val h3 = Multimodal.aHash64(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.noisyPngPayload(16, 16, 6L))))
    assert(java.lang.Long.bitCount(h1 ^ h3) > 3)

    val media = Seq(
      MediaRow(1L, base, "image/png", "t"),
      MediaRow(2L, perturbed, "image/png", "t"),
      MediaRow(3L, Multimodal.noisyPngPayload(16, 16, 6L), "image/png", "t"),
      MediaRow(4L, Array[Byte](1, 2, 3), "image/png", "t")) // undecodable
      .toDS()
    val pairs = Multimodal
      .phashPairs(Multimodal.imageAHashes(media), maxHamming = 3)
      .select($"a_id", $"b_id", $"hamming")
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((1L, 2L, hd)),
      s"band join must recall exactly the perturbed pair, got $pairs")
  }

  test("sequence packing: bins non-decreasing per source; greedy budget bound holds") {
    val got = rel.PipelineQueries.textPack.run(spark, sf)
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._2)
    got.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._1)
      assert(sorted.map(_._4).sliding(2).forall(p => p.head <= p.last),
        s"$src: bin ids must be non-decreasing in doc order")
      // greedy contiguous packing: a bin holds < budget + its last doc
      sorted.groupBy(_._4).foreach { case (bin, docs) =>
        val tokens = docs.map(_._3).sum
        assert(tokens < 2048 + docs.map(_._3).max,
          s"$src bin $bin overshoots the greedy bound: $tokens")
      }
    }
  }

  test("int8 quantization: checksum bounded by ±127·dim; scale is max |x|") {
    val got = rel.PipelineQueries.vecQuantize.run(spark, sf)
      .as[(Long, Double, Long, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, scale, checksum, nAtScale) =>
      assert(scale >= 0.0, s"$id")
      assert(math.abs(checksum) <= 127L * 64, s"$id checksum $checksum")
      assert(nAtScale >= 1 || scale == 0.0, s"$id: some component attains the max")
    }
  }

  test("bigram perplexity: smoothed probabilities < 1 ⇒ strictly positive NLL") {
    val got = rel.PipelineQueries.textPerplexity.run(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, n, nll) =>
      assert(n >= 1, s"$id")
      assert(nll > 0.0, s"$id: add-one smoothing keeps P < 1, so NLL > 0; got $nll")
    }
  }

  test("mixture weights: shares sum to ~1; rates in (0, 1]") {
    val got = rel.PipelineQueries.mixWeights.run(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length > 1)
    val shareSum = got.map(_._4).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum $shareSum")
    got.foreach { case (src, _, _, share, rate) =>
      assert(share > 0 && rate > 0 && rate <= 1.0, s"$src: $share $rate")
    }
  }

  test("fingerprint is order-sensitive (unlike minhash)") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(d, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) != fp(2L))
  }

  test("language id predicts via stopword hits deterministically") {
    val d = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze ist ein tier"),
      (3L, "el perro y los gatos es un animal")).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(d, "doc_id", "text")
      .select($"doc_id", $"pred_lang").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es"), s"$got")
  }

  test("JS divergence: zero on identical slices, symmetric, positive on drift") {
    val en = docs.filter($"lang" === "en")
    val de = docs.filter($"lang" === "de")
    val self = TextAnalysis.jsDivergence(en, en, "text")
      .as[(Double, Double, Double, Long)].head()
    assert(self._3 == 0.0, s"self-drift must be exactly 0: $self")
    val ab = TextAnalysis.jsDivergence(en, de, "text")
      .as[(Double, Double, Double, Long)].head()
    val ba = TextAnalysis.jsDivergence(de, en, "text")
      .as[(Double, Double, Double, Long)].head()
    assert(ab._3 > 0.0 && ab._3 <= math.log(2.0), s"JS in (0, ln2]: $ab")
    assert(ab._3 == ba._3 && ab._1 == ba._2 && ab._2 == ba._1,
      s"JS symmetric under slice swap: $ab vs $ba")
  }

  test("MMR keeps the top hit but trades relevance for diversity") {
    val got = rel.PipelineQueries.vecMmr.run(spark, sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got.length == 5 && got.map(_._2).distinct.length == 5, s"$got")
    val qv = array(rel.VectorQueries.queryVec.map(lit): _*)
    val byRel = Tables(spark, sf, "embeddings")
      .filter(size($"embedding") === 64)
      .select($"vec_id", round(graft.functions.vec.cosine($"embedding", qv), 6)
        .as("rel"))
      .orderBy($"rel".desc, $"vec_id").limit(5)
      .as[(Long, Double)].collect()
    assert(got.head._2 == byRel.head._1, "pick 1 is the global top hit")
    assert(got.map(_._2).toSet != byRel.map(_._1).toSet,
      "MMR must diverge from the plain top-5, else the diversity term is vacuous")
  }

  test("nDCG: 1.0 iff approx matches exact ranking; reversal scores lower") {
    val exact = Seq.tabulate(10)(i => (1L, 100L + i, 10 - i))
      .toDF("qid", "cid", "rel")
    val perfect = Seq.tabulate(10)(i => (1L, 100L + i, i + 1))
      .toDF("qid", "cid", "pos")
    val p = Similarity.ndcgAt(perfect, exact, k = 10)
      .as[(Long, Double, Double)].head()
    assert(p._3 == 1.0, s"perfect ranking must score exactly 1: $p")
    val reversed = Seq.tabulate(10)(i => (1L, 100L + i, 10 - i))
      .toDF("qid", "cid", "pos")
    val r = Similarity.ndcgAt(reversed, exact, k = 10)
      .as[(Long, Double, Double)].head()
    assert(r._3 < 1.0 && r._3 > 0.0, s"reversed ranking in (0,1): $r")
    // misses score 0: approx returning unrelated ids has dcg exactly 0
    val miss = Seq.tabulate(10)(i => (1L, 900L + i, i + 1))
      .toDF("qid", "cid", "pos")
    val m = Similarity.ndcgAt(miss, exact, k = 10)
      .as[(Long, Double, Double)].head()
    assert(m._2 == 0.0 && m._3 == 0.0, s"all-miss ranking scores 0: $m")
  }

  test("silhouette cells partition the corpus; scores in [0,1]") {
    val sil = rel.PipelineQueries.vecSilhouette.run(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(sil.map(_._2).sum == Tables(spark, sf, "embeddings").count(),
      "every vector lands in exactly one cell")
    assert(sil.forall(r => r._3 >= 0.0 && r._3 <= 1.0),
      s"cosine-argmax assignment forces s in [0,1]: ${sil.filterNot(r => r._3 >= 0 && r._3 <= 1).mkString(",")}")
    assert(sil.length > 1, "trained codebook must keep more than one cell")
  }

  test("ood: top outliers are the corpus-max nearest-centroid distances") {
    val ood = rel.PipelineQueries.vecOod.run(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(ood.length == 20)
    val scores = ood.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "ood descending")
    assert(scores.forall(s => s >= 0.0 && s <= 2.0), "1 - cos in [0,2]")
  }

  test("lsh precision/recall audit: planted clones all recovered, counts consistent") {
    val Array(r) = rel.PipelineQueries.dedupLshPr.run(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
    val (tp, fp, fn, prec, rec) = r
    assert(tp >= 20, s"the 20 planted clone pairs are all truth pairs and " +
      s"suffix-append keeps Jaccard far above threshold — LSH must catch them: tp=$tp")
    assert(prec == math.rint(tp.toDouble / (tp + fp) * 1e6) / 1e6 &&
      rec == math.rint(tp.toDouble / (tp + fn) * 1e6) / 1e6,
      "precision/recall re-derivable from the emitted counts")
    assert(prec >= 0.9 && rec >= 0.9,
      s"est-Jaccard >= 0.5 banding on near-identical plants: prec=$prec rec=$rec")
  }

  test("allPairsJaccard is EXACT: equals the brute-force cross join on the fixture") {
    val corpus = docs.select($"doc_id", $"text").unionByName(
      docs.filter($"doc_id" < 20)
        .select(($"doc_id" + 100000).as("doc_id"),
          concat($"text", lit(" qq17 zz88")).as("text")))
    val got = Dedup.allPairsJaccard(corpus, "doc_id", "text", 4, 5)
      .select($"a", $"b", $"inter", $"uni")
      .as[(Long, Long, Int, Int)].collect().toSet
    // brute force: every pair, exact Jaccard — the O(n²) baseline the
    // prefix-filtered plan must reproduce bit-for-bit (never ships)
    val sh = TextOps.spread(corpus)
      .select($"doc_id", TextOps.shingles(TextOps.tokens($"text")).as("shs"))
      .filter(size($"shs") > 0)
    val brute = sh.as("x")
      .join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("inter", size(array_intersect(col("x.shs"), col("y.shs"))))
      .withColumn("uni",
        size(col("x.shs")) + size(col("y.shs")) - col("inter"))
      .filter(col("inter") * 5 >= col("uni") * 4)
      .select(col("x.doc_id"), col("y.doc_id"), col("inter"), col("uni"))
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(got.size >= 20, s"the 20 planted pairs must surface: ${got.size}")
  }

  test("containmentPairs is EXACT: equals the brute-force cross join on the fixture") {
    // plant excerpts: first half of each doc_id < 10 — true containment 1.0
    val toks = TextOps.tokens($"text")
    val corpus = docs.select($"doc_id", $"text").unionByName(
      docs.filter($"doc_id" < 10)
        .select(($"doc_id" + 100000).as("doc_id"),
          array_join(slice(toks, lit(1),
            greatest((size(toks) / lit(2)).cast("int"), lit(4))), " ").as("text")))
    val got = Dedup.containmentPairs(corpus, "doc_id", "text", 9, 10,
        shingleK = 4)
      .select($"a", $"b", $"inter")
      .as[(Long, Long, Int)].collect().toSet
    val sh = TextOps.spread(corpus)
      .select($"doc_id",
        TextOps.shingles(TextOps.tokens($"text"), 4).as("shs"))
      .filter(size($"shs") > 0)
    val brute = sh.as("x")
      .join(sh.as("y"), col("x.doc_id") =!= col("y.doc_id"))
      .withColumn("inter", size(array_intersect(col("x.shs"), col("y.shs"))))
      .filter(col("inter") * 10 >= size(col("x.shs")) * 9)
      .select(col("x.doc_id"), col("y.doc_id"), col("inter"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    // every excerpt is contained in its original with containment exactly 1.0
    val planted = Dedup.containmentPairs(corpus, "doc_id", "text", 9, 10,
        shingleK = 4)
      .filter($"a" >= 100000 && $"b" === $"a" - 100000)
    assert(planted.count() == 10)
    assert(planted.filter($"containment" === 1.0).count() == 10,
      "a token-prefix excerpt's shingles are a subset of the original's")
  }

  test("containment catches what Jaccard misses: tiny excerpt in a long doc") {
    // excerpt = 6 tokens of a 60-token doc: containment(e→d) = 1.0 but
    // J = |E|/|D| = 4/58 ≈ 0.07 — below ANY usable Jaccard threshold
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 6).map(i => s"w$i").mkString(" ")
    val mini = Seq((1L, long), (2L, excerpt)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(mini, "doc_id", "text", 9, 10)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(cont == Set((2L, 1L)), s"directional: excerpt→original only, got $cont")
    val jac = Dedup.allPairsJaccard(mini, "doc_id", "text", 1, 2)
      .count()
    assert(jac == 0, "Jaccard at t=0.5 cannot see the pair")
  }

  test("allPairsJaccard threshold boundary: J = t kept, J < t dropped, clones J = 1") {
    // t = 1/2 on a tiny set algebra: J(1,2) = 2/4 = t exactly
    val mini = Seq(
      (1L, "a b c d e"),   // shingles {abc, bcd, cde}
      (2L, "a b c d f"),   // ∩ with 1 = 2, ∪ = 4 → J = 0.5 exactly
      (3L, "a b c x y z"), // ∩ with 1 = 1 (abc), ∪ = 6 → J ≈ 0.17
      (4L, "a b c d e")    // clone of 1 → J = 1
    ).toDF("doc_id", "text")
    val r = Dedup.allPairsJaccard(mini, "doc_id", "text", 1, 2)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(r.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"exactly the >= t pairs: ${r.keySet}")
    assert(r((1L, 2L)) == 0.5, "boundary pair kept at exactly t")
    assert(r((1L, 4L)) == 1.0, "clone pair at J = 1")
    // t = 4/5 integer-boundary: 11-token docs → 9 shingles; changing the
    // last token rewrites the final shingle only: inter 8, uni 10 → J = 0.8
    // exactly — kept iff the ceil/length/verify arithmetic is exact
    // rational (a double 0.8 threshold drops it at some lengths)
    val b5 = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 zz")
    ).toDF("doc_id", "text")
    val rb = Dedup.allPairsJaccard(b5, "doc_id", "text", 4, 5)
      .select($"a", $"b", $"inter", $"uni").as[(Long, Long, Int, Int)].collect()
    assert(rb.toSeq == Seq((1L, 2L, 8, 10)), s"J = 4/5 boundary pair: ${rb.toSeq}")
  }

  test("unigram-LM beats equal-budget BPE on corpus token count") {
    val uni = SparkEntry.queries("q_text_unigram_apply")(spark, sf)
      .agg(sum(col("uni_tokens"))).collect().head.getLong(0)
    val bpe = SparkEntry.queries("q_text_bpe")(spark, sf)
      .agg(sum(col("bpe_tokens"))).collect().head.getLong(0)
    // equal budget: 8 multi-char pieces (unigram) vs 8 merges (BPE);
    // Viterbi-optimal segmentation can pick pieces BPE's bottom-up
    // greedy merges never form
    assert(uni < bpe, s"unigram $uni vs bpe $bpe at equal piece budget")
  }

  test("unigram fertility: every language covered, pieces >= words") {
    val rows = SparkEntry.queries("q_text_unigram_fertility")(spark, sf)
      .collect()
    assert(rows.length == 5, "one row per fixture language")
    rows.foreach { r =>
      val (w, p, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(w > 0 && p >= w, s"a word segments into >= 1 piece: $r")
      assert(f >= 1.0 && math.abs(f - p.toDouble / w) < 1e-6,
        s"fertility is the per-lang mean pieces per word: $r")
    }
  }

  test("unigram segmentations are valid: pieces concatenate to the word") {
    val (_, perWord) = graft.pipeline.UnigramLm.train(
      Tables(spark, sf, "documents"), "text")
    val rows = perWord.select(col("w"),
      expr("replace(seg, ' ', '')").as("joined")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"segmentation must cover the word exactly: $r"))
  }

  test("OPQ snake allocation cuts trained-PQ quantization error") {
    val rows = SparkEntry.queries("q_ann_opq")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set("contiguous", "permuted"))
    assert(rows("permuted") < rows("contiguous"),
      s"variance-balanced layout must quantize better: $rows")
  }

  test("permuteBalanced is a permutation: multisets of values preserved") {
    val e = Tables(spark, sf, "embeddings").limit(20)
    val p = graft.pipeline.Similarity
      .permuteBalanced(e, "vec_id", "embedding", dim = 64, m = 8)
    val orig = e.select(col("vec_id"),
        expr("array_sort(cast(embedding as array<double>))").as("sorted"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val perm = p.select(col("vec_id"), expr("array_sort(embedding)").as("sorted"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(orig.keySet == perm.keySet)
    orig.foreach { case (k, v) => assert(perm(k) == v,
      s"vec $k values changed under the re-layout") }
  }

  test("domain classifier separates the planted domains (acc and macro-F1)") {
    val clf = SparkEntry.queries("q_text_domain_clf")(spark, sf).collect()
    assert(clf.length == 25, "5 classes x (bias + 4 coverage features)")
    val acc = clf.head.getDouble(3)
    assert(acc >= 0.95, s"train accuracy separates planted domains: $acc")
    val ev = SparkEntry.queries("q_text_domain_eval")(spark, sf).collect()
    assert(ev.length == 5)
    val macroF1 = ev.head.getDouble(7)
    assert(macroF1 >= 0.95, s"macro-F1: $macroF1")
    // zh has NO planted marker list — it must still be recovered from the
    // all-low-coverage signature, the test that the softmax actually
    // learned a boundary rather than memorizing one-hot markers
    val zh = ev.find(_.getString(0) == "zh").get
    assert(zh.getDouble(5) >= 0.9, s"zh recall: ${zh.getDouble(5)}")
  }

  test("decontam span pins the planted 12-token verbatim copy exactly") {
    // each planted corpus doc (100000+b) pairs with its own benchmark
    // source b at span exactly the 12 copied tokens (10 consecutive
    // shared 3-grams + 2) — the qx guard tokens stop the run from
    // extending past the plant; pairs with OTHER benchmark docs via
    // natural overlap are allowed but never reach 12
    val rows = SparkEntry.queries("q_text_decontam_span")(spark, sf)
      .filter(col("doc_id") >= 100000 &&
        col("doc_id") - 100000 === col("bdoc"))
      .orderBy("doc_id").collect()
    assert(rows.length == 5, s"planted pair per benchmark doc: ${rows.length}")
    rows.foreach { r =>
      assert(r.getInt(2) == 12, s"planted span must be exactly 12 tokens: $r")
    }
  }

  test("fuzzy decontam bridges a single token edit; exact stays split") {
    // the planted 12-token copy carries ONE substituted token: the exact
    // detector sees islands of 3 and 4 shared 3-grams (max span 6), the
    // gap-tolerant merge must recover the full 12 and never more
    val rows = SparkEntry.queries("q_text_decontam_fuzzy")(spark, sf)
      .filter(col("doc_id") >= 200000 &&
        col("doc_id") - 200000 === col("bdoc"))
      .orderBy("doc_id").collect()
    assert(rows.length == 5, s"planted pair per benchmark doc: ${rows.length}")
    rows.foreach { r =>
      assert(r.getInt(2) == 12, s"merged fuzzy span must be 12: $r")
      assert(r.getInt(3) == 6, s"exact span must stay 6: $r")
      assert(r.getLong(4) == 7L, s"3 + 4 matched positions: $r")
    }
  }

  test("dsir importance weights up-rank planted target-domain lookalikes") {
    // target = docs repeating vocabulary A; the pool doc that shares A
    // must out-weight the pool doc drawn from disjoint vocabulary B by a
    // wide margin. (At 4-doc scale a doc's OWN grams inflate the raw-pool
    // counts of exactly its buckets, so absolute signs are corpus-size
    // artifacts — the selection invariant is the ORDERING, and the
    // fixture-scale q_mix_dsir output shows en logw > 0 > off-domain.)
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight"
    val frame = Seq(
      (1L, s"$a $a", true), (2L, s"$a alpha beta", true),
      (10L, s"$a gamma delta", false), (11L, s"$b $b", false))
      .toDF("doc_id", "text", "is_t")
    val lw = Dsir.logWeights(frame, "doc_id", "text", col("is_t"))
      .select($"doc_id", $"lw".cast("double")).as[(Long, Double)]
      .collect().toMap
    assert(lw(10L) > lw(11L) + 5.0,
      s"lookalike must out-weight off-domain decisively: $lw")
  }

  test("unigram compression curve is monotone in the piece budget") {
    val rows = SparkEntry.queries("q_text_unigram_curve")(spark, sf)
      .orderBy("budget")
      .as[(Int, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(4, 8, 16))
    assert(rows(0)._2 > rows(1)._2 && rows(1)._2 >= rows(2)._2,
      s"larger budgets must not tokenize worse: ${rows.toSeq}")
    // budget 8 is the lm/apply trio's trained model — pin its number so
    // the shared-memo path and the standalone trainings stay one model
    assert(rows(1)._2 == 103301L, s"budget-8 corpus tokens: ${rows(1)._2}")
  }

  test("LSH tuning: chosen split maximizes expected F1 and the shipped " +
      "4x4 banding is the argmax on the planted pairs") {
    val rows = SparkEntry.queries("q_dedup_lsh_tune")(spark, sf)
      .select($"bands", $"rows_per_band", $"f1")
      .as[(Int, Int, Double)].collect()
    assert(rows.length == 5, "all five 16-perm factorizations present")
    assert(rows.map(r => (r._1, r._2)).toSet ==
      Set((16, 1), (8, 2), (4, 4), (2, 8), (1, 16)))
    // output is ordered best-first: row 1 IS the tuning choice
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq,
      s"rows must be ordered by expected F1 desc: ${rows.toSeq}")
    // the engine's minhashPairs ships i // 4 banding = 4 bands x 4 rows;
    // the closed-form curve must agree that it is the right default for
    // the >= 0.5 target threshold
    assert((rows.head._1, rows.head._2) == (4, 4),
      s"expected the shipped 4x4 banding to win: ${rows.toSeq}")
  }

  test("quality yield curve: kept volume and leak rate are monotone " +
      "nondecreasing in the threshold") {
    val rows = SparkEntry.queries("q_quality_yield")(spark, sf)
      .select($"thr", $"kept_docs", $"kept_token_share", $"bad_leak_rate")
      .as[(Double, Long, Double, Double)].collect()
    assert(rows.length == 9)
    assert(rows.map(_._1).toSeq == (1 to 9).map(_ / 10.0))
    def mono(xs: Seq[Double]) = xs.zip(xs.tail).forall { case (a, b) => a <= b }
    assert(mono(rows.map(_._2.toDouble).toSeq), s"kept_docs: ${rows.toSeq}")
    assert(mono(rows.map(_._3).toSeq), s"kept_token_share: ${rows.toSeq}")
    assert(mono(rows.map(_._4).toSeq), s"bad_leak_rate: ${rows.toSeq}")
    // the planted junk class must be separable: some cut keeps >= 40% of
    // tokens while leaking < 1% of planted-bad docs
    assert(rows.exists(r => r._3 >= 0.4 && r._4 < 0.01),
      s"no acceptable operating point on the curve: ${rows.toSeq}")
  }
}
