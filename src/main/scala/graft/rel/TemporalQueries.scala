package graft.rel

import graft.QueryDef

/** Round-8 batch 4: interval algebra, serial-dependence profiling,
  * monotone calibration, and a seeded differential-privacy release —
  * four operator classes the registry did not yet cover.
  *
  * Interval semantics: an "interval" is one (user, event_type, day)
  * activity span [min ts, max ts] in epoch MICROS (exact int64 —
  * never float seconds). Intervals are closed: an interval ending at t
  * still overlaps one starting at t (the sweep applies starts before
  * ends at equal timestamps).
  *
  * Float discipline per CLAUDE.md: exact integer/decimal sums first,
  * then ONE double expression with identical formula text in both
  * engines, round(…,6) before the hash.
  */
object TemporalQueries {

  /** The per-(user, type, day) interval table both interval operators
    * share. Bounded by users × types × days, never event rows; built by
    * one map-side-combinable groupBy over the corpus. */
  private val ivSpark = """
    iv AS (
      SELECT user_id, event_type, CAST(ts AS DATE) AS d,
             unix_micros(MIN(ts)) AS s, unix_micros(MAX(ts)) AS e
      FROM events GROUP BY 1, 2, 3)"""
  private val ivDuck = """
    iv AS (
      SELECT user_id, event_type, CAST(ts AS DATE) AS d,
             epoch_us(MIN(ts)) AS s, epoch_us(MAX(ts)) AS e
      FROM events GROUP BY 1, 2, 3)"""

  // ------------------------------------------------ sweep-line concurrency
  /** Max concurrent activity intervals per day — the classic sweep-line
    * operator SQL cannot express with joins alone (a self-join counts
    * pairwise overlaps, not simultaneous cardinality). Boundary events
    * (+starts, −ends) collapse to one row per distinct timestamp FIRST
    * (groupBy — so the window input is distinct boundary instants, and
    * the running sum is deterministic without a total tie-break), then
    * one running sum per day. Peak at t counts intervals active AT t
    * including those ending exactly there: running_after + ends_at_t.
    * Scale: the window partitions by day — embarrassingly parallel
    * across the time span; within a day the input is distinct boundary
    * instants of the user×type interval table, not raw events. */
  private def concSql(iv: String) = s"""
    WITH $iv,
    pts AS (
      SELECT d, s AS t, 1 AS st, 0 AS en FROM iv
      UNION ALL
      SELECT d, e AS t, 0 AS st, 1 AS en FROM iv),
    byts AS (
      SELECT d, t, CAST(SUM(st) AS BIGINT) AS starts,
             CAST(SUM(en) AS BIGINT) AS ends
      FROM pts GROUP BY d, t),
    run AS (
      SELECT d, starts, ends,
             SUM(starts - ends) OVER (PARTITION BY d ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS after
      FROM byts)
    SELECT d, CAST(MAX(after + ends) AS INT) AS peak,
           CAST(SUM(starts) AS BIGINT) AS n_intervals
    FROM run GROUP BY d ORDER BY d"""

  val intervalConcurrency = QueryDef.sqlBoth(
    "q_interval_concurrency", concSql(ivSpark), concSql(ivDuck))

  // ------------------------------------------------- interval union (islands)
  /** Per-user merged interval coverage — the gaps-and-islands operator:
    * overlapping/touching intervals merge into islands (a new island
    * starts where start > max end of ALL previous intervals, the
    * running-max form that is correct for nested intervals where the
    * naive lag(end) is not), then covered time = Σ island spans and
    * overlap time = raw Σ spans − covered. All duration math in exact
    * epoch-micros int64. Scale: both windows partition by user_id —
    * parallel across users, per-user row count bounded by types × days.
    * Output: top 20 users by covered time (deterministic tie-break). */
  private def unionSql(iv: String) = s"""
    WITH $iv,
    m AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_type, d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM iv),
    fl AS (
      SELECT user_id, s, e,
             CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nw
      FROM m),
    isl AS (
      SELECT user_id, s, e,
             SUM(nw) OVER (PARTITION BY user_id ORDER BY s, e, nw DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM fl),
    grp AS (
      SELECT user_id, island, MIN(s) AS gs, MAX(e) AS ge,
             CAST(SUM(e - s) AS BIGINT) AS raw_span
      FROM isl GROUP BY user_id, island)
    SELECT user_id, CAST(COUNT(*) AS INT) AS n_islands,
           CAST(SUM(ge - gs) AS BIGINT) AS covered_us,
           CAST(SUM(raw_span) - SUM(ge - gs) AS BIGINT) AS overlap_us
    FROM grp GROUP BY user_id
    ORDER BY covered_us DESC, user_id LIMIT 20"""

  val intervalUnion = QueryDef.sqlBoth(
    "q_interval_union", unionSql(ivSpark), unionSql(ivDuck))

  // ------------------------------------------------- autocorrelation profile
  /** ACF(1..7) of the daily event-volume series — the serial-dependence
    * profile (weekly periodicity shows as a lag-7 spike). The centered
    * cross-products NEVER accumulate in double: with exact integer sums
    * Sxy = Σ x_t·x_{t−L}, Sa = Σ_{t>L} x_t, Sb = Σ_{t≤n−L} x_t,
    * r_L = (Sxy − x̄·(Sa+Sb) + n_L·x̄²) / (Sxx − Sx²/n) — one double
    * expression per lag from DECIMAL(38,0) inputs (identical text both
    * engines ⇒ bit-identical). The ROW_NUMBER window runs over the
    * DAILY table (bounded by the time span — PlanScan-reviewed); the
    * corpus is touched only by the map-side daily count. */
  private val acfSql = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    seq AS (
      SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t
      FROM daily),
    tot AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx
      FROM seq),
    lags AS (SELECT * FROM (VALUES (1), (2), (3), (4), (5), (6), (7))
             AS v(lg)),
    pair AS (
      SELECT l.lg,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS np,
             CAST(SUM(a.x * b.x) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(a.x) AS DECIMAL(38,0)) AS sa,
             CAST(SUM(b.x) AS DECIMAL(38,0)) AS sb
      FROM lags l JOIN seq a ON a.t > l.lg
                  JOIN seq b ON b.t = a.t - l.lg
      GROUP BY l.lg)
    SELECT p.lg, CAST(p.np AS INT) AS n_pairs,
           round((CAST(p.sxy AS DOUBLE)
                    - (CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE))
                      * (CAST(p.sa AS DOUBLE) + CAST(p.sb AS DOUBLE))
                    + CAST(p.np AS DOUBLE)
                      * (CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE))
                      * (CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE)))
                 / (CAST(t.sxx AS DOUBLE)
                    - CAST(t.sx AS DOUBLE) * CAST(t.sx AS DOUBLE)
                      / CAST(t.n AS DOUBLE)), 6) AS acf
    FROM pair p CROSS JOIN tot t
    ORDER BY p.lg"""

  val statsAcf = QueryDef.sqlBoth("q_stats_acf", acfSql, acfSql)

  // ------------------------------------------------- isotonic calibration
  /** Exact isotonic (monotone nondecreasing) calibration of an empirical
    * rate — the PAVA fit computed by its CLOSED minimax form
    * fitted_i = max_{j≤i} min_{k≥i} weightedMean(y[j..k]) on a
    * constant-size bucket table (≤ 50 fixed-width length buckets), so
    * no iterative pooling and no driver loop: the corpus is touched by
    * ONE map-side groupBy; the O(B³) minimax runs on the 50-row bucket
    * table via range self-joins (tiny, broadcast). Signal: fraction of
    * documents containing the common token " the " as a function of
    * document length — genuinely monotone-ish, so pooling is exercised
    * where the raw rate locally inverts. Each segment mean is ONE
    * double division of exact integer prefix sums (identical text both
    * engines); MIN/MAX over doubles are order-independent. */
  private val isoSql = """
    WITH pts AS (
      SELECT least(CAST(floor(n_chars / 100.0) AS INT), 49) AS bk,
             CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END AS y
      FROM documents),
    agg AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
      FROM pts GROUP BY bk),
    pre AS (
      SELECT a.bk, a.n, a.sy,
             CAST(SUM(b.n) AS BIGINT) AS cn, CAST(SUM(b.sy) AS BIGINT) AS csy
      FROM agg a JOIN agg b ON b.bk <= a.bk GROUP BY a.bk, a.n, a.sy),
    seg AS (
      SELECT /*+ BROADCAST(j) */ j.bk AS jb, k.bk AS kb,
             CAST(k.csy - j.csy + j.sy AS DOUBLE)
               / CAST(k.cn - j.cn + j.n AS DOUBLE) AS mu
      FROM pre j JOIN pre k ON k.bk >= j.bk),
    minm AS (
      SELECT /*+ BROADCAST(i) */ s.jb, i.bk AS ib, MIN(s.mu) AS mn
      FROM seg s JOIN agg i ON s.jb <= i.bk AND s.kb >= i.bk
      GROUP BY s.jb, i.bk),
    fit AS (SELECT ib AS bk, MAX(mn) AS fitted FROM minm GROUP BY ib)
    SELECT CAST(a.bk AS INT) AS bk, a.n,
           round(CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE), 6) AS raw_rate,
           round(f.fitted, 6) AS fitted
    FROM agg a JOIN fit f ON f.bk = a.bk ORDER BY a.bk"""

  val calibIsotonic = QueryDef.sqlBoth("q_calib_isotonic", isoSql, isoSql)

  // -------------------------------------- Laplace mechanism TRANSFORM demo
  /** Laplace-mechanism TRANSFORM check — deterministic and NON-PRIVATE
    * by construction, and named accordingly (was q_privacy_dp, renamed
    * in round 9 after the advisor's finding): here u ∈ (0,1) is a
    * publicly-computable Weyl-style hash of the group key alone
    * ((key·2654435761 + 40503) mod 1000003 — exact int64, key ≤ 24 so
    * no overflow), so anyone can recompute and subtract the noise.
    * That is unavoidable for a DECLARED query: the oracle contract
    * publishes the full SQL, so no secret can live in it. What this
    * query pins is the MECHANISM ARITHMETIC — the inverse-CDF
    * transform noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|) at sensitivity 1,
    * ε = 0.5, and the floor/clamp of the released count — bit-for-bit
    * across both engines. The actual ε-DP operator, with the noise
    * keyed by a SECRET per-release seed (passed in, never in the plan
    * text), is [[graft.pipeline.Privacy.laplaceRelease]] —
    * distribution- and reproducibility-tested in PrivacySpec; use THAT
    * for a real release, never this demo. One groupBy over the corpus;
    * constant rows out; the double transform is one expression with
    * identical text in both engines. */
  private val dpSql = """
    WITH c AS (
      SELECT c_nationkey AS nat, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1),
    u AS (
      SELECT nat, cnt,
             CAST((nat * 2654435761 + 40503) % 1000003 AS DOUBLE)
               / 1000003.0 - 0.5 AS u0
      FROM c),
    l AS (
      SELECT nat, cnt,
             -2.0 * (CASE WHEN u0 < 0 THEN -1.0 ELSE 1.0 END)
               * ln(1.0 - 2.0 * abs(u0)) AS noise
      FROM u)
    SELECT nat, cnt AS true_cnt, round(noise, 6) AS noise,
           greatest(CAST(floor(cnt + noise) AS BIGINT), CAST(0 AS BIGINT))
             AS released,
           CAST(0.5 AS DOUBLE) AS epsilon
    FROM l ORDER BY nat"""

  val privacyDp = QueryDef.sqlBoth("q_dp_mechanism", dpSql, dpSql)

  // ------------------------------------------------ Theil-Sen robust trend
  /** Theil-Sen robust trend estimator over the daily event-volume
    * series (Theil 1950 / Sen 1968): slope = median over all day pairs
    * of (x_j − x_i)/(t_j − t_i), intercept = median of x_i − m·t_i —
    * the breakdown-point-29% alternative to OLS that one corrupted
    * ingestion day cannot drag (the robust complement of q_stats_ols,
    * exactly as q_stats_mad complements variance). All inputs exact
    * integers (daily counts, epoch-day t); each slope is ONE double
    * division with identical text in both engines, rounded to 9dp
    * BEFORE ranking; medians are lower-median by ROW_NUMBER with full
    * tie-breaks — bit-deterministic, no quantile interpolation to
    * diverge on. Scale: the pair table and its windows are bounded by
    * the TIME SPAN squared (a century of days → ~6.7·10⁸ pairs, and a
    * distributed median-of-pairs would switch to the O(n log n)
    * Matoušek selection); the CORPUS is touched only by the map-side
    * daily groupBy — the q_stats_changepoint shape. The pair join
    * broadcasts the bounded daily table — a broadcast nested-loop over
    * time-span-sized sides, never a corpus cartesian (the
    * q_calib_isotonic segment-join convention; DuckDB reads the hint
    * as a comment). */
  val statsTheilsen = QueryDef.sqlBoth(
    "q_stats_theilsen",
    theilSenSql("datediff(d, DATE '1970-01-01')"),
    theilSenSql("date_diff('day', DATE '1970-01-01', d)"))

  private def theilSenSql(dayExpr: String) = s"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    pts AS (SELECT CAST(($dayExpr) AS INT) AS t, x FROM daily),
    pr AS (
      SELECT a.t AS t1, b.t AS t2,
             round(CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE), 9)
               AS m
      FROM pts a JOIN pts b ON b.t > a.t),
    ms AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m, t1, t2) AS rn,
                  COUNT(*) OVER () AS np
           FROM pr),
    med AS (SELECT m AS slope FROM ms
            WHERE rn = CAST(floor((np + 1) / 2.0) AS BIGINT)),
    ic AS (SELECT round(CAST(p.x AS DOUBLE) - med.slope * p.t, 9) AS b0, p.t
           FROM pts p CROSS JOIN med),
    ibs AS (SELECT b0, ROW_NUMBER() OVER (ORDER BY b0, t) AS rn,
                   COUNT(*) OVER () AS nb
            FROM ic),
    imed AS (SELECT b0 AS intercept FROM ibs
             WHERE rn = CAST(floor((nb + 1) / 2.0) AS BIGINT))
    SELECT /*+ BROADCAST(imed) */ med.slope, imed.intercept,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_days,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pr) AS n_pairs
    FROM med CROSS JOIN imed"""

  // --------------------------------------------- Holt linear smoothing
  /** Holt double-exponential smoothing (level + trend, α = β = 0.5) over
    * the daily event-volume series — the forecasting/monitoring
    * companion to q_stats_acf/q_stats_seasonal/q_events_decay (which
    * smooth level only; Holt tracks a drifting TREND, the statistic a
    * volume monitor alerts on). The recurrence runs as the SAME
    * `WITH RECURSIVE` text on both engines (the q_graph_bfs_sql
    * pattern): l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1} — identical IEEE op
    * sequence, so the smoothed path is bit-identical cross-engine; the
    * 6dp output rounding uses the floor idiom (invariant 12: with
    * α = 1/2 every state is a dyadic rational, and dyadic rationals DO
    * land exactly on .xxxxxx5 — round() would tie-split). Recursion
    * depth = #days (bounded by the time span, never corpus rows); the
    * corpus is touched once by the map-side daily groupBy, and the
    * Spark side localCheckpoints the daily table BEFORE the recursion
    * (UnionLoop re-executes the step subtree per level — the CLAUDE.md
    * materialize-first rule). */
  private def holtCte(daily: String) =
    s"""hw(t, x, l, b) AS (
       |  SELECT CAST(1 AS BIGINT), d1.x,
       |         CAST(d1.x AS DOUBLE),
       |         CAST(d2.x - d1.x AS DOUBLE)
       |  FROM $daily d1 JOIN $daily d2 ON d2.t = 2
       |  WHERE d1.t = 1
       |  UNION ALL
       |  SELECT d.t, d.x,
       |         0.5 * d.x + 0.5 * (hw.l + hw.b),
       |         0.5 * ((0.5 * d.x + 0.5 * (hw.l + hw.b)) - hw.l) + 0.5 * hw.b
       |  FROM hw JOIN $daily d ON d.t = hw.t + 1)""".stripMargin

  private val holtSelect =
    """SELECT t, x,
      |       floor(l * 1e6 + 0.5) / 1e6 AS level,
      |       floor(b * 1e6 + 0.5) / 1e6 AS trend,
      |       floor((l + b) * 1e6 + 0.5) / 1e6 AS forecast_next
      |FROM hw ORDER BY t""".stripMargin

  val statsHolt = QueryDef(
    "q_stats_holt",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      // r14-opt: the recurrence is a SEQUENTIAL fold over a tiny daily
      // series (≤ #days rows, bounded by the time span) — the old
      // WITH RECURSIVE ran one UnionLoop level PER DAY, each a full
      // Spark job over a 1-row frontier (~90 jobs at sf0.1, measured
      // 3.4-5.0 s of pure scheduling). Collect the ordered series into
      // ONE array row and evaluate the identical IEEE op sequence as a
      // single `aggregate` fold expression: l_t = 0.5·x_t +
      // 0.5·(l+b), b_t = 0.5·(l_t − l) + 0.5·b with l_t recomputed
      // inline exactly as the oracle's recursive member writes it, so
      // every intermediate double is bit-identical to the recursion's.
      // One job, two shuffles (daily agg + rn window) instead of ~90.
      val pr = graft.graph.NodeEmbedding.pround _
      val daily = graft.Tables(s, dir, "events")
        .groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("x"))
        .select(row_number().over(Window.orderBy(col("d")))
          .cast("long").as("t"), col("x"))
      val stT = "array<struct<t:bigint,x:bigint,l:double,b:double>>"
      val newL = (e: org.apache.spark.sql.Column,
                  p: org.apache.spark.sql.Column) =>
        lit(0.5) * e.getField("x") +
          lit(0.5) * (p.getField("l") + p.getField("b"))
      val folded = daily
        .agg(array_sort(collect_list(struct(col("t"), col("x")))).as("xs"))
        .select(when(size(col("xs")) < 2, array().cast(stT))
          .otherwise(aggregate(
            // fold over t = 2..n (1-based slice from index 2): the anchor
            // array is the t = 1 row only — its b consumes x_2, but the
            // t = 2 ROW still comes from the fold, exactly like the
            // oracle's recursive member (d.t = hw.t + 1 from hw.t = 1)
            slice(col("xs"), lit(2), size(col("xs")) - 1),
            array(struct(
              lit(1L).as("t"),
              element_at(col("xs"), 1).getField("x").as("x"),
              element_at(col("xs"), 1).getField("x").cast("double").as("l"),
              (element_at(col("xs"), 2).getField("x") -
                element_at(col("xs"), 1).getField("x")).cast("double").as("b"))),
            (acc, e) => {
              val p = element_at(acc, -1)
              concat(acc, array(struct(
                e.getField("t").as("t"), e.getField("x").as("x"),
                newL(e, p).as("l"),
                (lit(0.5) * (newL(e, p) - p.getField("l")) +
                  lit(0.5) * p.getField("b")).as("b"))))
            })).as("hw"))
      folded.select(explode(col("hw")).as("r"))
        .select(col("r.t").as("t"), col("r.x").as("x"),
          pr(col("r.l"), 6).as("level"),
          pr(col("r.b"), 6).as("trend"),
          pr(col("r.l") + col("r.b"), 6).as("forecast_next"))
        .orderBy(col("t"))
    },
    Some(s"""WITH RECURSIVE daily0 AS MATERIALIZED (
         |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |daily AS MATERIALIZED (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t, x
         |  FROM daily0),
         |${holtCte("daily")}
         |$holtSelect""".stripMargin))

  val all: Seq[QueryDef] = Seq(intervalConcurrency, intervalUnion, statsAcf,
    calibIsotonic, privacyDp, statsTheilsen, statsHolt)
}
