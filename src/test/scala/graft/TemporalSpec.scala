package graft

import org.apache.spark.sql.functions._

/** Round-8 batch 4: interval algebra, ACF, isotonic calibration, seeded
  * DP release. Each declared query is cross-checked here against an
  * independent driver-side brute force on the fixture (the oracle hash
  * match checks Spark vs DuckDB; these specs check the ALGORITHM vs a
  * from-first-principles reimplementation). */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  /** The fixture's (user, type, day) intervals, driver-side. */
  private lazy val intervals: Seq[(Long, Long, Long)] = {
    Tables(spark, sf, "events")
      .groupBy($"user_id", $"event_type", to_date($"ts").as("d"))
      .agg(unix_micros(min($"ts")).as("s"), unix_micros(max($"ts")).as("e"))
      .select($"user_id", $"s", $"e")
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("interval concurrency matches a driver-side sweep per day") {
    val got = SparkEntry.queries("q_interval_concurrency")(spark, sf)
      .select(date_format($"d", "yyyy-MM-dd"), $"peak", $"n_intervals")
      .as[(String, Int, Long)].collect().toSeq

    val byDay = Tables(spark, sf, "events")
      .groupBy($"user_id", $"event_type",
        date_format(to_date($"ts"), "yyyy-MM-dd").as("d"))
      .agg(unix_micros(min($"ts")).as("s"), unix_micros(max($"ts")).as("e"))
      .select($"d", $"s", $"e")
      .as[(String, Long, Long)].collect().toSeq.groupBy(_._1)

    val want = byDay.toSeq.sortBy(_._1).map { case (d, ivs) =>
      // brute sweep: at each distinct boundary t, count closed-interval
      // coverage s <= t <= e (starts-before-ends tie rule == closed)
      val bounds = ivs.flatMap(i => Seq(i._2, i._3)).distinct
      val peak = bounds.map(t => ivs.count(i => i._2 <= t && t <= i._3)).max
      (d, peak, ivs.size.toLong)
    }
    assert(got == want)
  }

  test("interval union matches driver-side merge; overlap is the residual") {
    val got = SparkEntry.queries("q_interval_union")(spark, sf)
      .as[(Long, Int, Long, Long)].collect().toSeq

    val want = intervals.groupBy(_._1).map { case (u, ivs) =>
      val sorted = ivs.map(i => (i._2, i._3)).sortBy(identity)
      // classic merge of sorted closed intervals (touching merges)
      val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (ms, me) :: rest if s <= me =>
            (ms, math.max(me, e)) :: rest
          case _ => (s, e) :: acc
        }
      }
      val covered = merged.map { case (s, e) => e - s }.sum
      val raw = ivs.map(i => i._3 - i._2).sum
      (u, merged.size, covered, raw - covered)
    }.toSeq.sortBy(r => (-r._3, r._1)).take(20)
    assert(got == want)
  }

  test("acf matches driver-side exact computation and stays in [-1, 1]") {
    val got = SparkEntry.queries("q_stats_acf")(spark, sf)
      .as[(Int, Int, Double)].collect().toSeq
    val daily = Tables(spark, sf, "events")
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("x"))
      .orderBy($"d").select($"x").as[Long].collect().map(_.toDouble)
    val n = daily.length
    val xb = daily.sum / n
    val den = daily.map(x => (x - xb) * (x - xb)).sum
    got.foreach { case (lg, np, acf) =>
      assert(np == n - lg)
      val num = (lg until n).map(t => (daily(t) - xb) * (daily(t - lg) - xb)).sum
      assert(math.abs(acf - num / den) < 1e-6, s"lag $lg: $acf vs ${num / den}")
      assert(acf >= -1.0 && acf <= 1.0)
    }
    assert(got.map(_._1) == (1 to 7))
  }

  test("isotonic fit equals driver-side PAVA and is nondecreasing") {
    val got = SparkEntry.queries("q_calib_isotonic")(spark, sf)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    // fitted is monotone nondecreasing over buckets
    got.map(_._4).sliding(2).foreach {
      case Seq(a, b) => assert(a <= b + 1e-12); case _ => ()
    }
    // PAVA by iterative pooling on the same (n, sy) buckets
    case class Block(n: Long, sy: Long) { def mu: Double = sy.toDouble / n }
    var blocks = got.map(r => (List(r._1), Block(r._2,
      math.round(r._3 * r._2)))).toList // raw_rate*n rounds back to sy exactly
    var changed = true
    while (changed) {
      changed = false
      blocks = blocks.foldLeft(List.empty[(List[Int], Block)]) {
        case ((pk, pb) :: rest, (k, b)) if pb.mu > b.mu + 1e-15 =>
          changed = true
          (pk ++ k, Block(pb.n + b.n, pb.sy + b.sy)) :: rest
        case (acc, kb) => kb :: acc
      }.reverse
    }
    val pava = blocks.flatMap { case (ks, b) => ks.map(_ -> b.mu) }.toMap
    got.foreach { case (bk, _, _, fitted) =>
      assert(math.abs(fitted - pava(bk)) < 1e-6,
        s"bucket $bk: minimax $fitted vs pava ${pava(bk)}")
    }
    // pooling is actually exercised somewhere on the fixture or the fit
    // is identical to raw everywhere (both are valid; assert consistency)
    val anyPooled = got.exists(r => math.abs(r._3 - r._4) > 1e-9)
    val allEq = got.forall(r => math.abs(r._3 - r._4) < 1e-9)
    assert(anyPooled || allEq)
  }

  test("dp mechanism demo: deterministic, floor-consistent, nonnegative") {
    val run1 = SparkEntry.queries("q_dp_mechanism")(spark, sf)
      .as[(Int, Long, Double, Long, Double)].collect().toSeq
    val run2 = SparkEntry.queries("q_dp_mechanism")(spark, sf)
      .as[(Int, Long, Double, Long, Double)].collect().toSeq
    assert(run1 == run2) // seeded: a pure function of the group key
    run1.foreach { case (nat, cnt, noise, released, eps) =>
      assert(eps == 0.5)
      assert(released >= 0)
      // noise col is rounded to 1e-6, so allow a 1-step boundary slack
      assert(math.abs(released - math.max(math.floor(cnt + noise), 0.0)) <= 1,
        s"nat $nat release inconsistent")
      // Laplace(b=2) quantile bound: |noise| <= b*ln(1000003) ~ 27.6
      assert(math.abs(noise) < 28.0)
    }
    // noise must not be one-sided (sign depends on the key hash)
    assert(run1.exists(_._3 > 0) && run1.exists(_._3 < 0))
  }
}
