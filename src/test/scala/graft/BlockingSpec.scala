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
