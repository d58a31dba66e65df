package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Blocking

/** Entropy-escalation blocking (pipeline/Blocking.scala) — the operator
  * that acts on the q_link_blocking_eval audit. Pins the property that
  * makes refinement safe where purging is not: escalation is decided
  * per BLOCK, so rows that agree on the whole ladder co-escalate. */
class BlockingSpec extends SparkSpec {
  import spark.implicits._

  // Synthetic skew: one hot template family (shared 8-prefix "tmplAA_0",
  // distinct digits at positions 9-12 → the 12-prefix splits it to
  // singletons) + cold rows with distinct 8-prefixes, each with a
  // planted twin that agrees on every ladder key.
  private def corpus = {
    val hot = (0 until 200).map(i => (i.toLong, f"tmplAA_0$i%04d_tail"))
    val cold = (1000 until 1040).map(i => (i.toLong, f"cold$i%04d_suffix"))
    val twins = cold.map { case (id, nm) => (id + 9000, nm) } // exact key twins
    (hot ++ cold ++ twins).toDF("id", "nm")
  }
  private def ladder = Seq(
    substring($"nm", 1, 8), substring($"nm", 1, 12), substring($"nm", 1, 16))

  test("hot blocks escalate, cold blocks keep the coarse key") {
    val assigned = Blocking.assign(corpus, ladder, cap = 32)
    val levels = assigned
      .select(substring($"blk", 1, 2).as("lvl"), $"nm")
      .groupBy($"lvl").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 200 hot rows share k0 (block 200 > cap) but split to singletons at
    // the 12-prefix → exactly one escalation, to L1; the 80 cold rows
    // (40 ids + twins) sit in blocks of 2 → stay L0.
    assert(levels.getOrElse("L0", 0L) == 80, s"cold rows must stay coarse: $levels")
    assert(levels.getOrElse("L1", 0L) == 200, s"hot family must refine once: $levels")
  }

  test("co-escalation: every planted twin pair survives at ANY cap") {
    for (cap <- Seq(1, 8, 32, 512)) {
      val cand = Blocking.candidates(corpus, "id", ladder, cap)
        .filter($"b_id" === $"a_id" + 9000 && $"a_id" >= 1000 && $"a_id" < 1040)
      assert(cand.count() == 40, s"cap=$cap lost planted twins")
    }
  }

  test("each candidate pair is emitted exactly once (single final block)") {
    val cand = Blocking.candidates(corpus, "id", ladder, cap = 32)
    assert(cand.count() == cand.select($"a_id", $"b_id").distinct().count())
  }

  test("escalation beats the constant coarse key on candidate volume") {
    val esc = Blocking.audit(corpus, ladder, cap = 32)
      .select($"cand_pairs").as[Long].head()
    val const = Blocking.audit(corpus, ladder.take(1), cap = 32)
      .select($"cand_pairs").as[Long].head()
    // constant key: hot family contributes 200·199/2 pairs; escalated:
    // the same family split by full 16-prefix into singletons.
    assert(const >= 19900L, s"test premise broke: $const")
    assert(esc < const / 10, s"escalation should collapse the hot block: $esc vs $const")
  }

  test("null ladder keys are retained, not silently dropped") {
    // The per-level histogram attaches via inner equi-join; without the
    // NUL-sentinel coalesce, NULL-keyed rows vanish from candidates()
    // and undercount audit().n_docs.
    val withNulls = corpus.withColumn("nm",
      when($"id" === 1000L || $"id" === 10000L, lit(null: String))
        .otherwise($"nm"))
    val audited = Blocking.audit(withNulls, ladder, cap = 32)
      .select($"n_docs").as[Long].head()
    assert(audited == corpus.count(),
      s"null-keyed rows dropped: n_docs=$audited of ${corpus.count()}")
    // the two null rows share the sentinel block → they pair with each other
    val cand = Blocking.candidates(withNulls, "id", ladder, cap = 32)
      .filter($"a_id" === 1000L && $"b_id" === 10000L)
    assert(cand.count() == 1, "null-keyed rows must form their own block")
  }

  test("meta policy: hot-final-block rows re-block by the alt family") {
    // A template corpus the ladder cannot split: constant 16-prefix, so
    // every ladder level is one hot block; distinct tails are the alt
    // (suffix) family's signal. Twins differ at positions 17-18 — inside
    // the string, outside right-8.
    val docs = (0 until 100).map(i => (i.toLong, f"TEMPLATE-BOILER-$i%02dxx_t$i%04d"))
    val twins = docs.take(20).map { case (id, nm) =>
      (id + 9000, nm.substring(0, 16) + "ZZ" + nm.substring(18)) }
    val tmpl = (docs ++ twins).toDF("id", "nm")
    val lad = Seq(substring($"nm", 1, 8), substring($"nm", 1, 12),
      substring($"nm", 1, 16))
    val alt = Seq(expr("right(nm, 5)"), expr("right(nm, 8)"))
    // plain ladder: one irreducible hot block → quadratic pairs
    val plain = Blocking.audit(tmpl, lad, cap = 16)
      .select($"cand_pairs", $"max_block").as[(Long, Long)].head()
    assert(plain._2 == 120L, s"premise: final block must be the whole corpus, got $plain")
    // meta: alt family splits the hot block; every twin still recalled
    val metaPairs = Blocking.candidatesMeta(tmpl, "id", lad, alt, cap = 16)
    val twinsRecalled = metaPairs
      .filter($"b_id" === $"a_id" + 9000 && $"a_id" < 20).count()
    assert(twinsRecalled == 20, s"meta lost twins: $twinsRecalled/20")
    val metaAudit = Blocking.auditMeta(tmpl, lad, alt, cap = 16)
      .select($"cand_pairs", $"n_docs").as[(Long, Long)].head()
    assert(metaAudit._2 == 120L, "meta partition must cover every row")
    assert(metaAudit._1 < plain._1 / 10,
      s"alt family should collapse the hot block: ${metaAudit._1} vs ${plain._1}")
    // audit agrees with materialized pair count (partition ⇒ no dedup needed)
    assert(metaPairs.count() == metaAudit._1)
  }

  test("audit matches a brute-force pair count") {
    val cap = 32
    val brute = {
      val a = Blocking.assign(corpus, ladder, cap)
      a.select($"id".as("x"), $"blk").join(a.select($"id".as("y"), $"blk"), "blk")
        .filter($"x" < $"y").count()
    }
    val audited = Blocking.audit(corpus, ladder, cap)
      .select($"cand_pairs").as[Long].head()
    assert(audited == brute)
  }
}
