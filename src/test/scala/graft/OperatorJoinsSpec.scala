package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** graft.operators.Joins: as-of, band, and salted joins checked against
  * naive formulations on both hand-built edge cases and fixtures. */
class OperatorJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward picks the latest right row at or before left time") {
    val quotes = Seq( // (key, t, px)
      (1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0),
      (2L, 15L, 9.0)).toDF("qk", "qt", "px")
    val trades = Seq( // (key, t, id)
      (1L, 5L, "before-any"), (1L, 10L, "exact-match"),
      (1L, 25L, "between"), (1L, 99L, "after-all"),
      (2L, 14L, "miss"), (3L, 50L, "no-key")).toDF("tk", "tt", "id")

    val out = Joins.asofBackward(trades, "tk", "tt", quotes, "qk", "qt",
        payload = Seq("qt", "px"))
      .select($"id", $"qt", $"px").as[(String, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

    assert(out("before-any") == ((None, None)))
    assert(out("exact-match") == ((Some(10L), Some(1.0))), "<= is inclusive")
    assert(out("between") == ((Some(20L), Some(2.0))))
    assert(out("after-all") == ((Some(30L), Some(3.0))))
    assert(out("miss") == ((None, None)))
    assert(out("no-key") == ((None, None)))
  }

  test("asofBackward resolves same-time right ties to the greatest payload") {
    val right = Seq((1L, 10L, 100L), (1L, 10L, 200L), (1L, 10L, 150L))
      .toDF("rk", "rt", "rid")
    val left = Seq((1L, 10L, "x")).toDF("lk", "lt", "id")
    val out = Joins.asofBackward(left, "lk", "lt", right, "rk", "rt", Seq("rid"))
      .select($"rid").as[Long].collect()
    assert(out.toSeq == Seq(200L), "max payload wins the time tie")
  }

  test("asofBackward: NULL right times/keys never match (SQL join semantics)") {
    val right = Seq(
      (Some(1L), Some(10L), 100L),  // real row
      (Some(1L), None, 666L),       // null time — must never win
      (None, Some(5L), 777L))       // null key — must never match anything
      .toDF("rk", "rt", "rid")
    val left = Seq(
      (Some(1L), Some(5L), "before"),   // before the real row → no match
      (Some(1L), Some(20L), "after"),   // after → real row, not the null-time one
      (None, Some(50L), "nullkey"))     // null left key → no match
      .toDF("lk", "lt", "id")
    val out = Joins.asofBackward(left, "lk", "lt", right, "rk", "rt", Seq("rid"))
      .select($"id", $"rid").as[(String, Option[Long])].collect().toMap
    assert(out("before").isEmpty, "null-time right row must not sort first and win")
    assert(out("after").contains(100L))
    assert(out("nullkey").isEmpty, "null keys must not match each other")
  }

  test("bandJoin == naive theta join on fixture balances") {
    val c = Tables(spark, sf, "customer").select($"c_custkey", $"c_acctbal")
    val s = Tables(spark, sf, "supplier").select($"s_suppkey", $"s_acctbal")
    val banded = Joins.bandJoin(c, "c_acctbal", s, "s_acctbal", 25.0)
      .select($"s_suppkey", $"c_custkey").as[(Long, Long)].collect().toSet
    val naive = s.crossJoin(c)
      .filter(abs($"s_acctbal" - $"c_acctbal") < 25.0)
      .select($"s_suppkey", $"c_custkey").as[(Long, Long)].collect().toSet
    assert(banded == naive)
    assert(naive.nonEmpty, "band width must produce matches to be a real test")
  }

  test("bandJoin boundary: strict inequality excludes exact-width pairs") {
    val l = Seq((1L, 0.0)).toDF("lid", "lv")
    val r = Seq((10L, 10.0), (20L, 9.5), (30L, -10.0), (40L, -9.5))
      .toDF("rid", "rv")
    val got = Joins.bandJoin(l, "lv", r, "rv", 10.0)
      .select($"rid").as[Long].collect().toSet
    assert(got == Set(20L, 40L), "|diff| == width must be excluded, just-inside kept")
  }

  test("bandJoin handles negative values (floor-bin correctness)") {
    val l = Seq((1L, -0.5), (2L, -10.0), (3L, 9.9)).toDF("lid", "lv")
    val r = Seq((10L, 0.5), (20L, -19.0), (30L, 10.1)).toDF("rid", "rv")
    val got = Joins.bandJoin(l, "lv", r, "rv", 10.0)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    val want = for {
      (lid, lv) <- Set((1L, -0.5), (2L, -10.0), (3L, 9.9))
      (rid, rv) <- Set((10L, 0.5), (20L, -19.0), (30L, 10.1))
      if math.abs(lv - rv) < 10.0
    } yield (lid, rid)
    assert(got == want)
  }

  test("asofBackward == naive per-row argmax on random data (seeded)") {
    // deterministic pseudo-random data: small key space forces collisions,
    // duplicated times force tie-breaking
    val rnd = new scala.util.Random(42)
    val rightRows = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong))
    val leftRows = Seq.tabulate(120)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(60).toLong, i.toLong))
    val right = rightRows.toDF("rk", "rt", "rid")
    val left = leftRows.toDF("lk", "lt", "id")

    val got = operators.Joins
      .asofBackward(left, "lk", "lt", right, "rk", "rt", Seq("rid", "rt"))
      .select($"id", $"rid").as[(Long, Option[Long])].collect().toMap

    leftRows.foreach { case (lk, lt, id) =>
      val cands = rightRows.filter(r => r._1 == lk && r._2 <= lt)
      val want =
        if (cands.isEmpty) None
        else {
          val maxT = cands.map(_._2).max
          Some(cands.filter(_._2 == maxT).map(_._3).max) // payload tie → max rid
        }
      assert(got(id) == want, s"left row $id (key $lk, t $lt)")
    }
  }

  test("bandJoin == naive filter on random data across bin boundaries (seeded)") {
    val rnd = new scala.util.Random(7)
    val ls = Seq.tabulate(150)(i => (i.toLong, (rnd.nextDouble() - 0.5) * 200))
    val rs = Seq.tabulate(150)(i => (i.toLong, (rnd.nextDouble() - 0.5) * 200))
    val got = operators.Joins
      .bandJoin(ls.toDF("lid", "lv"), "lv", rs.toDF("rid", "rv"), "rv", 7.5)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (lid, lv) <- ls; (rid, rv) <- rs if math.abs(lv - rv) < 7.5
    } yield (lid, rid)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("degenerate inputs: empty sides yield empty/null, never throw") {
    import org.apache.spark.sql.functions.lit
    val l = Seq((1L, 10L, "x")).toDF("lk", "lt", "id")
    val emptyR = Seq.empty[(Long, Long, Long)].toDF("rk", "rt", "rid")
    val asof = operators.Joins.asofBackward(l, "lk", "lt", emptyR, "rk", "rt", Seq("rid"))
    assert(asof.count() == 1 && asof.select($"rid").as[Option[Long]].head().isEmpty,
      "empty right → left preserved with null payload")

    val emptyL = Seq.empty[(Long, Long, String)].toDF("lk", "lt", "id")
    val r = Seq((1L, 5L, 9L)).toDF("rk", "rt", "rid")
    assert(operators.Joins.asofBackward(emptyL, "lk", "lt", r, "rk", "rt", Seq("rid")).count() == 0)

    val band = operators.Joins.bandJoin(
      Seq((1L, 0.5)).toDF("lid", "lv"), "lv",
      Seq.empty[(Long, Double)].toDF("rid", "rv"), "rv", 10.0)
    assert(band.count() == 0)

    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graph.GraphAnalytics.triangleCounts(empty).count() == 0)
    assert(graph.GraphAnalytics.pageRankFixedPoint(empty, 3).count() == 0,
      "empty graph must not divide by zero")
    assert(pipeline.Sketches.kmvDistinct(
      Seq.empty[(String, Long)].toDF("g", "k"), "g", "k", 8).count() == 0)
    assert(pipeline.Sketches.cmsEstimate(
      pipeline.Sketches.cmsBuild(Seq.empty[(Long, Long)].toDF("d0", "k"), "k", 3, 64),
      Seq((5L, 1L)).toDF("k", "z").select(lit(5L).as("k")), "k", 3, 64)
      .as[(Long, Long)].collect().toSeq == Seq((5L, 0L)),
      "probing an empty sketch estimates zero")
  }

  test("saltedJoin == plain equi-join") {
    val e = Tables(spark, sf, "events").select($"event_id", $"user_id")
    val c = Tables(spark, sf, "customer").select($"c_custkey", $"c_name")
    val salted = Joins.saltedJoin(e, "user_id", pmod($"event_id", lit(4)), c, "c_custkey", 4)
      .select($"event_id", $"c_custkey").as[(Long, Long)].collect().toSet
    val plain = e.join(c, $"user_id" === $"c_custkey")
      .select($"event_id", $"c_custkey").as[(Long, Long)].collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
