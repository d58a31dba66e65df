package graft.rel

import graft.{QueryDef, Tables}
import graft.pipeline.HeavyHitters
import org.apache.spark.sql.functions._

/** Round-8 batch 3: data-quality and information-theoretic audits plus
  * the deterministic heavy-hitters summary — four operator classes the
  * registry did not yet cover (conformance auditing, dependence
  * profiling, offline changepoint detection, counter-based frequent
  * items).
  *
  * Float discipline per CLAUDE.md: every double expression is written
  * with IDENTICAL formula text in both engines over exact integer
  * inputs (same IEEE op sequence ⇒ bit-identical), then round(…,6/12)
  * before the hash; order-sensitive totals go through DECIMAL sums of
  * the already-rounded terms (exact, associative).
  */
object QualityQueries {

  // -------------------------------------------------------- Benford audit
  /** First-digit conformance audit (Benford's law) over order totals —
    * the classic fraud/data-quality screen for multi-magnitude positive
    * amounts. Exact integer cents → first decimal digit → 9-row digit
    * histogram joined to the closed-form expectation n·log10(1+1/d),
    * with the per-digit chi-square contribution. One groupBy over a
    * 9-key space (map-side partial agg collapses each partition to ≤ 9
    * rows), one 1-row total broadcast — constant-size intermediate at
    * any corpus scale. The log10 is floor-rounded at 8dp BEFORE the n·
    * scaling (invariant 10 — the r13 full-sf1 sweep caught a 1-ulp JVM
    * vs C-libm log10 split that n ≈ 1.5M amplified onto a 6dp floor
    * boundary); after that every operand double is bit-identical, so
    * both floor-idiom outputs match at any n. */
  val qualityBenford = QueryDef.sqlBoth(
    "q_quality_benford",
    sparkSql = """
      WITH cents AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
      digits AS (
        SELECT CAST(substring(CAST(c AS STRING), 1, 1) AS INT) AS d1,
               COUNT(*) AS obs
        FROM cents GROUP BY 1),
      tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM digits),
      e AS (
        SELECT d1, obs,
               CAST(n AS DOUBLE) * (floor(log10(1.0 + 1.0/d1) * 1e8 + 0.5) / 1e8) AS exp_raw
        FROM digits CROSS JOIN tot)
      SELECT d1, obs, floor(exp_raw * 1e6 + 0.5) / 1e6 AS expected,
             floor((obs - exp_raw) * (obs - exp_raw) / exp_raw * 1e6 + 0.5) / 1e6 AS chi_term
      FROM e ORDER BY d1""",
    duckSql = """
      WITH cents AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
      digits AS (
        SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INT) AS d1,
               COUNT(*) AS obs
        FROM cents GROUP BY 1),
      tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM digits),
      e AS (
        SELECT d1, obs,
               CAST(n AS DOUBLE) * (floor(log10(1.0 + 1.0/d1) * 1e8 + 0.5) / 1e8) AS exp_raw
        FROM digits CROSS JOIN tot)
      SELECT d1, obs, floor(exp_raw * 1e6 + 0.5) / 1e6 AS expected,
             floor((obs - exp_raw) * (obs - exp_raw) / exp_raw * 1e6 + 0.5) / 1e6 AS chi_term
      FROM e ORDER BY d1""")

  // ------------------------------------------- mutual-information profile
  /** Column-dependence profile: exact mutual information between
    * customer nation and market segment. The contingency table is one
    * groupBy over |nations|×|segments| cells (tiny at any scale — the
    * margins derive FROM the cells, so the corpus is scanned exactly
    * once); each cell's MI term pxy·ln(pxy/(px·py)) is computed from
    * exact integer counts with identical double formula text in both
    * engines, rounded to 8 places (the q_text_drift/q_events_decay
    * transcendental discipline: round-12 of a raw ln-product keeps
    * ~40 platform-dependent bits of libm output and hash-diverged on
    * the r9 driver despite matching DuckDB 1.0.0 locally
    * bit-for-bit — round-8 crushes the ulp); the total is the EXACT
    * integer sum of the scaled terms — associative, so
    * partition-order-independent.
    *
    * OUTPUT TYPE (round-10 post-mortem): the terms are emitted as
    * SCALED BIGINTs (`mi_term_e8` = term × 10^8), NOT DECIMAL(18,8).
    * Three consecutive rounds of DECIMAL(18,8) terms hash-failed at
    * the driver while matching the local oracle value-for-value, and
    * the r10 verdict's scan showed this was the ONLY registry query
    * emitting a NEGATIVE decimal column (63/125 terms < 0) while
    * negative BIGINT/DOUBLE outputs pass in 28 green queries — the
    * driver's hasher canonicalizes signed int64-backed parquet
    * decimals differently from DuckDB (CLAUDE.md invariant 11).
    * Signed fixed-point integers carry the identical information
    * portably: |MI| ≤ ln(25) < 4, so |term|·10^8 < 4·10^8 ≪ 2^63.
    * The scale factor is exact on both engines: round-8 double →
    * DECIMAL(18,8) (no tie: the double sits ~1e-16·|x| ≪ 5e-9 from
    * the 8dp grid point) → ×10^8 exact decimal multiply → exact
    * integer cast. The feature-selection / schema-drift audit a
    * training pipeline runs before trusting a column pair. */
  val statsMi = QueryDef.sqlBoth(
    "q_stats_mi",
    sparkSql = """
      WITH cells AS (
        SELECT c_nationkey AS nat, c_mktsegment AS seg, COUNT(*) AS cxy
        FROM customer GROUP BY 1, 2),
      rx AS (SELECT nat, CAST(SUM(cxy) AS BIGINT) AS cx FROM cells GROUP BY 1),
      ry AS (SELECT seg, CAST(SUM(cxy) AS BIGINT) AS cy FROM cells GROUP BY 1),
      tot AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n FROM cells),
      terms AS (
        SELECT nat, seg, cxy,
               CAST(CAST(round((CAST(cxy AS DOUBLE) / n) *
                          ln((CAST(cxy AS DOUBLE) * n) /
                             (CAST(cx AS DOUBLE) * cy)), 8)
                    AS DECIMAL(18,8)) * 100000000 AS BIGINT) AS mi_term_e8
        FROM cells JOIN rx USING (nat) JOIN ry USING (seg) CROSS JOIN tot),
      total AS (
        SELECT CAST(SUM(mi_term_e8) AS BIGINT) AS mi_total_e8
        FROM terms)
      SELECT nat, seg, cxy, mi_term_e8, mi_total_e8
      FROM terms CROSS JOIN total
      ORDER BY nat, seg""",
    duckSql = """
      WITH cells AS (
        SELECT c_nationkey AS nat, c_mktsegment AS seg, COUNT(*) AS cxy
        FROM customer GROUP BY 1, 2),
      rx AS (SELECT nat, CAST(SUM(cxy) AS BIGINT) AS cx FROM cells GROUP BY 1),
      ry AS (SELECT seg, CAST(SUM(cxy) AS BIGINT) AS cy FROM cells GROUP BY 1),
      tot AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n FROM cells),
      terms AS (
        SELECT nat, seg, cxy,
               CAST(CAST(round((CAST(cxy AS DOUBLE) / n) *
                          ln((CAST(cxy AS DOUBLE) * n) /
                             (CAST(cx AS DOUBLE) * cy)), 8)
                    AS DECIMAL(18,8)) * 100000000 AS BIGINT) AS mi_term_e8
        FROM cells JOIN rx USING (nat) JOIN ry USING (seg) CROSS JOIN tot),
      total AS (
        SELECT CAST(SUM(mi_term_e8) AS BIGINT) AS mi_total_e8
        FROM terms)
      SELECT nat, seg, cxy, mi_term_e8, mi_total_e8
      FROM terms CROSS JOIN total
      ORDER BY nat, seg""")

  // ------------------------------------------------ changepoint detection
  /** Offline single-changepoint statistic over the daily event-volume
    * series: for every prefix t, the scaled CUSUM deviation
    * |n·S_t − t·S_n| (the max-deviation statistic of binary
    * segmentation — large where the mean level shifts). ALL-INTEGER:
    * prefix sums and the cross term run in DECIMAL(38,0)/HUGEINT (at
    * 100 TB, n·S_t ≈ days·events overflows int64 — the round-8 audit
    * class), so both engines agree exactly with no float anywhere.
    * The OUTPUT `dev` is CAST to BIGINT — the portable parquet
    * envelope (precision-38 decimals write as decimal128, which the
    * r8 driver hasher canonicalizes differently from DuckDB). The
    * cast is safe while days·events < 2^63: at 10^13 events over 10^4
    * days that is ~10^17 < 9.2·10^18, so BIGINT holds the statistic
    * even at the 100 TB design point; only the INTERNAL products need
    * the wide type (nd·st accumulates before |…| shrinks it).
    * The window runs over the DAILY aggregate (one row per calendar
    * day — bounded by the time span, not the corpus), which is why the
    * global ORDER BY d window is safe at any scale; the corpus itself
    * is touched only by the map-side-combinable daily count. Output:
    * top-5 candidate split days by deviation. */
  val statsChangepoint = QueryDef.sqlBoth(
    "q_stats_changepoint",
    sparkSql = """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1),
      seq AS (
        SELECT d, x,
               CAST(ROW_NUMBER() OVER (ORDER BY d) AS INT) AS t,
               CAST(SUM(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS DECIMAL(38,0)) AS st
        FROM daily),
      tot AS (SELECT CAST(SUM(x) AS DECIMAL(38,0)) AS sn,
                     CAST(COUNT(*) AS DECIMAL(38,0)) AS nd
              FROM daily)
      SELECT d, t, x,
             CAST(abs(nd * st - t * sn) AS BIGINT) AS dev
      FROM seq CROSS JOIN tot
      ORDER BY dev DESC, d LIMIT 5""",
    duckSql = """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1),
      seq AS (
        SELECT d, x,
               CAST(ROW_NUMBER() OVER (ORDER BY d) AS INT) AS t,
               CAST(SUM(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS HUGEINT) AS st
        FROM daily),
      tot AS (SELECT CAST(SUM(x) AS HUGEINT) AS sn,
                     CAST(COUNT(*) AS HUGEINT) AS nd
              FROM daily)
      SELECT d, t, x,
             CAST(abs(nd * st - t * sn) AS BIGINT) AS dev
      FROM seq CROSS JOIN tot
      ORDER BY dev DESC, d LIMIT 5""")

  // ------------------------------------------- deterministic heavy hitters
  /** Exact heavy hitters via the two-pass Misra–Gries recipe
    * (pipeline/HeavyHitters.scala): pass 1 reduces the stream to ≤ k−1
    * guaranteed-complete candidate counters (deterministic, mergeable,
    * no randomness — the counter-based complement to q_sketch_cms);
    * pass 2 recounts ONLY the broadcast candidate set exactly and keeps
    * keys with cnt·k > n (all-integer threshold). The sketch's
    * candidate set may vary with partition merge order, but the recount
    * output is always exactly the true heavy hitters — which is what
    * the oracle (a plain GROUP BY … HAVING over all keys) checks. Key
    * space: planted skew — 25% of events hash to 3 hot keys (~8.3%
    * each, above the n/16 = 6.25% bar); the rest are singleton cold
    * keys the full-groupBy oracle must aggregate but the sketch never
    * materializes. */
  val sketchHeavyhit = QueryDef(
    "q_sketch_heavyhit",
    (s, dir) => {
      import s.implicits._
      val K = 16
      val keyed = Tables(s, dir, "events").select(
        when($"event_id" % 4 === 0,
          concat(lit("hot_"), ($"event_id" % 3).cast("string")))
          .otherwise(concat(lit("cold_"), $"event_id".cast("string"))).as("k"))
      val cand = keyed.agg(HeavyHitters.candidates($"k", K).as("cand"))
        .select(explode($"cand").as("k"))
      val tot = keyed.agg(count(lit(1)).as("n"))
      keyed.join(broadcast(cand), "k")
        .groupBy($"k").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .filter($"cnt" * K > $"n")
        .select($"k", $"cnt")
        .orderBy($"cnt".desc, $"k")
    },
    Some("""WITH keyed AS (
              SELECT CASE WHEN event_id % 4 = 0
                          THEN 'hot_' || CAST(event_id % 3 AS VARCHAR)
                          ELSE 'cold_' || CAST(event_id AS VARCHAR) END AS k
              FROM events),
            tot AS (SELECT COUNT(*) AS n FROM keyed),
            cnts AS (SELECT k, COUNT(*) AS cnt FROM keyed GROUP BY 1)
            SELECT k, cnt FROM cnts CROSS JOIN tot
            WHERE cnt * 16 > n
            ORDER BY cnt DESC, k"""))

  // ------------------------------------------ two-sample KS statistic
  /** Two-sample Kolmogorov-Smirnov profile: weekday vs weekend purchase
    * values. The statistic is computed over VALUE-BUCKETED empirical
    * CDFs (floor(value·10) — exact integer keys), so the prefix-sum
    * window runs over a table bounded by the VALUE DOMAIN (≤ ~5k
    * buckets at any corpus size — PlanScan-reviewed, the changepoint
    * convention), while the corpus is touched only by one map-side
    * groupBy. Day-of-week comes from epoch-day arithmetic (day 0 =
    * Thursday ⇒ days%7 ∈ {2,3} = Sat/Sun) — the same integer formula in
    * both engines, immune to engine dow-numbering differences. Each
    * deviation is ONE double expression of exact integer counts;
    * output: top-5 split points by |F_weekday − F_weekend|. */
  private def ksSql(dowExpr: String) = s"""
    WITH v AS (
      SELECT CASE WHEN ($dowExpr) % 7 IN (2, 3) THEN 1 ELSE 0 END AS we,
             CAST(floor(value * 10.0) AS INT) AS bk
      FROM events WHERE event_type = 'purchase'),
    h AS (
      SELECT bk, CAST(SUM(1 - we) AS BIGINT) AS wd_n,
             CAST(SUM(we) AS BIGINT) AS we_n
      FROM v GROUP BY bk),
    t AS (SELECT CAST(SUM(wd_n) AS BIGINT) AS na,
                 CAST(SUM(we_n) AS BIGINT) AS nb FROM h),
    c AS (
      SELECT bk,
             CAST(SUM(wd_n) OVER (ORDER BY bk ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
             CAST(SUM(we_n) OVER (ORDER BY bk ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
      FROM h)
    SELECT bk, ca, cb,
           round(abs(CAST(ca AS DOUBLE) / CAST(t.na AS DOUBLE)
                   - CAST(cb AS DOUBLE) / CAST(t.nb AS DOUBLE)), 6) AS dev
    FROM c CROSS JOIN t
    ORDER BY dev DESC, bk LIMIT 5"""

  val statsKs = QueryDef.sqlBoth(
    "q_stats_ks",
    ksSql("datediff(CAST(ts AS DATE), DATE '1970-01-01')"),
    ksSql("date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"))

  // --------------------------------------- join-cardinality estimation
  /** Optimizer-statistics operator: predict join output size WITHOUT
    * executing the join. Two predictors per join — the EXACT key
    * histogram identity |A ⋈ B| = Σ_k c_A(k)·c_B(k) (one groupBy per
    * side + an equi-join on the tiny key-histogram tables) and the
    * classic System-R uniform estimate |A|·|B| / max(ndv_A, ndv_B) —
    * checked against the actually-executed join count, with the
    * System-R relative error quantified. Covers a PK-FK join
    * (orders ⋈ customer — System-R is exact there) and a skewed
    * many-many self-join (events ⋈ events on user_id — where uniform
    * NDV estimation goes wrong and histograms don't). Σ c_A·c_B
    * ACCUMULATES in DECIMAL(38,0) (partial products of two hot-key
    * counts can exceed int64 mid-sum ordering-dependently); the final
    * `predicted` is then cast to BIGINT as the portable output
    * envelope — valid while the predicted JOIN CARDINALITY itself is
    * < 2^63, which holds for any join an engine would actually
    * execute (9.2·10^18 output rows is not a runnable plan; a
    * predictor reporting larger belongs in DOUBLE as an order-of-
    * magnitude signal, not an exact count). NOTE on the `actual`
    * column: both engines EXECUTE the skewed self-join to produce it —
    * that is a fixture-scale verification device for the estimator
    * (estimate vs ground truth), deliberately NOT part of the at-scale
    * operator; at 100 TB only the histogram/System-R predictors run. */
  private val joinSizeSql = """
    WITH ca AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                FROM orders GROUP BY 1),
    cb AS (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
           FROM customer GROUP BY 1),
    ea AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
    oc AS (
      SELECT CAST(SUM(CAST(ca.c AS DECIMAL(38,0)) * cb.c) AS BIGINT)
               AS predicted
      FROM ca JOIN cb ON ca.k = cb.k),
    oc_stats AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM ca) AS ra,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ca) AS da,
             (SELECT CAST(SUM(c) AS BIGINT) FROM cb) AS rb,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cb) AS db),
    oc_act AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS actual
      FROM orders JOIN customer ON o_custkey = c_custkey),
    ev AS (
      SELECT CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT) AS predicted,
             CAST(SUM(c) AS BIGINT) AS ra, CAST(COUNT(*) AS BIGINT) AS da
      FROM ea),
    ev_act AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS actual
      FROM events a JOIN events b ON a.user_id = b.user_id),
    rows_out AS (
      SELECT 'events_self' AS jn, ev.predicted, ev_act.actual,
             CAST(ev.ra AS DOUBLE) * CAST(ev.ra AS DOUBLE)
               / CAST(ev.da AS DOUBLE) AS sysr
      FROM ev CROSS JOIN ev_act
      UNION ALL
      SELECT 'orders_customer' AS jn, oc.predicted, oc_act.actual,
             CAST(s.ra AS DOUBLE) * CAST(s.rb AS DOUBLE)
               / CAST(CASE WHEN s.da > s.db THEN s.da ELSE s.db END
                      AS DOUBLE) AS sysr
      FROM oc CROSS JOIN oc_act CROSS JOIN oc_stats s)
    SELECT jn, predicted, actual, round(sysr, 6) AS sysr_est,
           round(abs(sysr - CAST(actual AS DOUBLE))
                 / CAST(actual AS DOUBLE), 6) AS sysr_rel_err
    FROM rows_out ORDER BY jn"""

  val statsJoinsize = QueryDef.sqlBoth(
    "q_stats_joinsize", joinSizeSql, joinSizeSql)

  val all: Seq[QueryDef] =
    Seq(qualityBenford, statsMi, statsChangepoint, sketchHeavyhit,
      statsKs, statsJoinsize)
}
