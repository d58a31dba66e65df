package graft.rel

import graft.{QueryDef, Tables}
import graft.pipeline.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical-inference and mining operators a production data platform
  * runs beside the pipeline queries — resampling uncertainty (bootstrap),
  * censored-time-to-event analysis (Kaplan-Meier), association mining
  * (frequent itemsets), and loss-driven mixture reweighting (DoReMi-style
  * exponentiated gradient):
  *
  *   - q_stats_bootstrap — Poisson-bootstrap confidence interval for the
  *     mean order value. The classical n-out-of-n resample is a driver
  *     loop; the POISSON bootstrap (each row enters replicate b with
  *     Poisson(1) multiplicity — Chamandy et al., "Estimating Uncertainty
  *     for Massive Data Streams", Google TR 2012) is the at-scale form:
  *     one explode by B, one keyed aggregation, map-side combinable.
  *   - q_events_survival — Kaplan-Meier estimator (Kaplan & Meier, JASA
  *     1958) over user lifetimes with right-censoring at the observation
  *     horizon: per-user reduce, per-duration counts, prefix sums over
  *     the ≤ day-span duration table.
  *   - q_events_itemsets — frequent event-type pairs with support and
  *     lift (Agrawal & Srikant, VLDB'94 shape, pair order): baskets are
  *     (user, day) DISTINCT type sets, the pair join is per-basket and
  *     bounded by the type-domain squared, never corpus².
  *   - q_mix_doremi — one exponentiated-gradient domain-reweighting step
  *     (DoReMi, Xie et al. NeurIPS'23): per-domain excess loss under the
  *     global unigram LM, softmax with uniform smoothing — the
  *     loss-driven counterpart of q_mix_temperature's count-driven rule.
  *
  * Float discipline (CLAUDE.md invariants 10/12): counts and Poisson
  * weights are exact integers; every transcendental (ln/exp) rounds to
  * ≤8dp via the floor idiom `floor(x·10^k + 0.5)/10^k` spelled
  * identically in both SQL texts; rounded terms sum through exact
  * DECIMALs; quotients are single IEEE divisions of exactly-representable
  * inputs (portable), floor-rounded only at the output edge.
  */
object InferenceQueries {

  /** Engine-portable k-dp rounding (see NodeEmbedding.pround). */
  private def pr(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
  private def prSql(x: String, k: Int) = s"floor(($x) * 1e$k + 0.5) / 1e$k"

  private val toksSql =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""

  // ------------------------------------------------- Poisson bootstrap
  /** Poisson(1) CDF thresholds P(X ≤ k), k = 0..7: a row's replicate
    * multiplicity is the count of thresholds its uniform draw clears
    * (inverse-CDF transform; the k ≥ 9 tail mass ~1.1e-6 truncates to
    * weight 8 — the same convention in both engines, so no split).
    * Literals are the shortest round-trip doubles; decimal-literal →
    * double parsing is correctly rounded in Spark and DuckDB alike. */
  private val poissonCdf = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712", "0.9999897508033253")

  /** Uniform u ∈ [0,1) keyed by a string: top 13 hex digits of md5 give
    * an exact 52-bit integer; /2^52 is a pure exponent shift, so u is
    * EXACT and bit-identical across engines (the TextOps.strHash / e8
    * uniform family). */
  private def u52(key: Column): Column =
    conv(substring(md5(key), 1, 13), 16, 10).cast("long") /
      lit((1L << 52).toDouble)
  private def u52Sql(x: String) =
    s"CAST(('0x' || substr(md5($x), 1, 13)) AS BIGINT) / ${(1L << 52).toDouble}"

  /** Percentile-method bootstrap CI for the mean order value: B = 200
    * Poisson replicates, each row carrying an md5-drawn Poisson(1)
    * multiplicity per replicate; CI endpoints are the 5th / 196th order
    * statistics of the replicate means ((B+1)·0.025 = 5.025 → 5,
    * (B+1)·0.975 = 195.975 → 196 — the classical percentile rule).
    * Scale shape: ONE projection explodes each row ×B (no join), the
    * replicate aggregation is map-side combinable into exactly B groups,
    * and everything downstream runs on the 200-row replicate table (the
    * ordered rank window is bounded by the CONSTANT B —
    * PlanScan.globalWindowReviewed). Money goes through exact cents
    * (DECIMAL(18,2)·100 → BIGINT); replicate means are single IEEE
    * divisions of exact integers, floor-rounded 6dp at the edge. */
  val statsBootstrap = QueryDef(
    "q_stats_bootstrap",
    (s, dir) => {
      import s.implicits._
      val b = 200
      val o = TextOps.spread(Tables(s, dir, "orders"))
        .select($"o_orderkey",
          ($"o_totalprice".cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
      val wCase = poissonCdf.map(c => when(col("u") >= lit(c.toDouble), 1L)
        .otherwise(0L)).reduce(_ + _)
      val reps = o
        .select($"o_orderkey", $"cents",
          explode(expr(s"sequence(1, $b)")).as("rep"))
        .withColumn("u", u52(concat(lit("boot:"),
          $"o_orderkey".cast("string"), lit(":"), $"rep".cast("string"))))
        .withColumn("w", wCase)
        .groupBy($"rep")
        .agg(sum($"w").as("sw"), sum($"w" * $"cents").as("swx"))
        .select($"rep", ($"swx".cast("double") / $"sw").as("mean_b"))
      val rn = Window.orderBy($"mean_b", $"rep")
      val ci = reps.withColumn("rn", row_number().over(rn))
        .agg(max(when($"rn" === 5, $"mean_b")).as("lo"),
          max(when($"rn" === 196, $"mean_b")).as("hi"))
      val base = o.agg(count(lit(1)).as("n_orders"),
        (sum($"cents").cast("double") / count(lit(1))).as("mean_cents"))
      base.crossJoin(broadcast(ci))
        .select($"n_orders", lit(b).as("b"),
          pr($"mean_cents", 6).as("mean_cents"),
          pr($"lo", 6).as("lo_cents"), pr($"hi", 6).as("hi_cents"))
    },
    Some(s"""WITH o AS (SELECT o_orderkey,
             |            CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             |          FROM orders),
             |x AS (SELECT o_orderkey, cents, CAST(u.r AS INT) AS rep,
             |             ${u52Sql("'boot:' || o_orderkey || ':' || CAST(u.r AS INT)")} AS u
             |      FROM o, unnest(range(1, 201)) AS u(r)),
             |w AS (SELECT rep,
             |             ${poissonCdf.map(c => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)")
                              .mkString(" + ")} AS w, cents
             |      FROM x),
             |m AS (SELECT rep, 1.0 * CAST(SUM(w * cents) AS BIGINT) / CAST(SUM(w) AS BIGINT) AS mean_b
             |      FROM w GROUP BY rep),
             |r AS (SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, rep) AS rn FROM m),
             |ci AS (SELECT MAX(CASE WHEN rn = 5 THEN mean_b END) AS lo,
             |              MAX(CASE WHEN rn = 196 THEN mean_b END) AS hi FROM r),
             |base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
             |                1.0 * CAST(SUM(cents) AS BIGINT) / COUNT(*) AS mean_cents
             |         FROM o)
             |SELECT n_orders, 200 AS b, ${prSql("mean_cents", 6)} AS mean_cents,
             |       ${prSql("lo", 6)} AS lo_cents, ${prSql("hi", 6)} AS hi_cents
             |FROM base, ci""".stripMargin))

  // ---------------------------------------------------- Kaplan-Meier
  /** Kaplan-Meier time-to-conversion with right-censoring: per user,
    * duration runs from the first event day to the first `purchase` day
    * (event observed); users who never purchase are censored at the
    * corpus horizon. Per distinct duration t: at-risk
    * n(t) (prefix-sum complement), events d(t), censored c(t), and
    * S(t) = Π_{t'≤t, d>0} (1 − d/n) via 8dp-floor-rounded ln factors
    * summed through exact DECIMAL and exponentiated once per row (if a
    * time exhausts the risk set, S pins to 0 from there — the ln(0)
    * guard). Scale shape: the corpus is touched only by the per-user
    * reduce; every window runs over the ≤ day-span duration table
    * (PlanScan.globalWindowReviewed). */
  val eventsSurvival = QueryDef(
    "q_events_survival",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .select($"user_id", $"ts".cast("date").as("d"), $"event_type")
      val g = ev.agg(max($"d").as("gm"))
      val per = ev.groupBy($"user_id")
        .agg(min($"d").as("fd"),
          min(when($"event_type" === "purchase", $"d")).as("pd"))
        .crossJoin(broadcast(g))
        .select(
          when($"pd".isNotNull, 1).otherwise(0).as("e"),
          when($"pd".isNotNull, datediff($"pd", $"fd"))
            .otherwise(datediff($"gm", $"fd")).cast("int").as("t"))
      val byT = per.groupBy($"t").agg(
        count(lit(1)).as("c_all"),
        sum(when($"e" === 1, 1L).otherwise(0L)).as("d_events"),
        sum(when($"e" === 1, 0L).otherwise(1L)).as("c_censored"))
      val tot = per.agg(count(lit(1)).as("n"))
      val wPrev = Window.orderBy($"t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wIncl = Window.orderBy($"t")
        .rowsBetween(Window.unboundedPreceding, 0)
      byT.crossJoin(broadcast(tot))
        .withColumn("n_risk", $"n" - coalesce(sum($"c_all").over(wPrev), lit(0L)))
        .withColumn("lf",
          when($"d_events" === 0 || $"d_events" >= $"n_risk",
            lit(0).cast(DecimalType(18, 8)))
            .otherwise(pr(log(lit(1.0) - $"d_events" / $"n_risk"), 8)
              .cast(DecimalType(18, 8))))
        .withColumn("ls", sum($"lf").over(wIncl))
        .withColumn("zf", max(when($"d_events" >= $"n_risk", 1).otherwise(0))
          .over(wIncl))
        .select($"t".as("t_days"), $"n_risk", $"d_events", $"c_censored",
          when($"zf" === 1, lit(0.0))
            .otherwise(pr(exp($"ls".cast("double")), 6)).as("surv"))
        .orderBy($"t_days")
    },
    Some(s"""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d, event_type FROM events),
             |g AS (SELECT MAX(d) AS gm FROM ev),
             |ul AS (SELECT user_id, MIN(d) AS fd,
             |              MIN(CASE WHEN event_type = 'purchase' THEN d END) AS pd
             |       FROM ev GROUP BY 1),
             |per AS (SELECT CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS e,
             |               CAST(CASE WHEN pd IS NOT NULL
             |                    THEN date_diff('day', fd, pd)
             |                    ELSE date_diff('day', fd, gm) END AS INT) AS t
             |        FROM ul, g),
             |byt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c_all,
             |               CAST(SUM(CASE WHEN e = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d_events,
             |               CAST(SUM(CASE WHEN e = 1 THEN 0 ELSE 1 END) AS BIGINT) AS c_censored
             |        FROM per GROUP BY t),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per),
             |r AS (SELECT t, d_events, c_censored,
             |             n - CAST(COALESCE(SUM(c_all) OVER (ORDER BY t
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
             |      FROM byt, tot),
             |sv AS (SELECT t, n_risk, d_events, c_censored,
             |              SUM(CASE WHEN d_events = 0 OR d_events >= n_risk
             |                       THEN CAST(0 AS DECIMAL(18,8))
             |                       ELSE CAST(${prSql("ln(1.0 - 1.0 * d_events / n_risk)", 8)} AS DECIMAL(18,8)) END)
             |                OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ls,
             |              MAX(CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END)
             |                OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zf
             |       FROM r)
             |SELECT t AS t_days, n_risk, d_events, c_censored,
             |       CASE WHEN zf = 1 THEN 0.0
             |            ELSE ${prSql("exp(CAST(ls AS DOUBLE))", 6)} END AS surv
             |FROM sv ORDER BY t_days""".stripMargin))

  // ------------------------------------------------ frequent itemsets
  /** Frequent event-type pairs with support and lift: baskets = DISTINCT
    * (user, day, type); the a < b self-join is keyed by basket, so its
    * fan-out is bounded by the type-domain choose 2 per basket — never
    * corpus². Lift = n_ab·N / (n_a·n_b): exact BIGINT products, one IEEE
    * division, floor-rounded 6dp. minsup = 5 baskets. */
  val eventsItemsets = QueryDef(
    "q_events_itemsets",
    (s, dir) => {
      import s.implicits._
      val b = Tables(s, dir, "events")
        .select($"user_id", $"ts".cast("date").as("day"), $"event_type")
        .distinct()
      val nb = b.select($"user_id", $"day").distinct()
        .agg(count(lit(1)).as("nbaskets"))
      val singles = b.groupBy($"event_type").agg(count(lit(1)).as("ns"))
      val pairs = b.as("x")
        .join(b.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.day") === col("y.day") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter($"n_ab" >= 5)
      pairs
        .join(broadcast(singles.select($"event_type".as("a"), $"ns".as("n_a"))), "a")
        .join(broadcast(singles.select($"event_type".as("b"), $"ns".as("n_b"))), "b")
        .crossJoin(broadcast(nb))
        .select($"a", $"b", $"n_ab", $"n_a", $"n_b",
          pr(($"n_ab" * $"nbaskets").cast("double") / ($"n_a" * $"n_b"), 6)
            .as("lift"))
        .orderBy($"n_ab".desc, $"a", $"b")
    },
    Some(s"""WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
             |          FROM events),
             |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbaskets
             |       FROM (SELECT DISTINCT user_id, day FROM b)),
             |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ns FROM b GROUP BY 1),
             |p AS (SELECT x.event_type AS a, y.event_type AS b,
             |             CAST(COUNT(*) AS BIGINT) AS n_ab
             |      FROM b x JOIN b y ON x.user_id = y.user_id AND x.day = y.day
             |        AND x.event_type < y.event_type
             |      GROUP BY 1, 2 HAVING COUNT(*) >= 5)
             |SELECT p.a, p.b, p.n_ab, sa.ns AS n_a, sb.ns AS n_b,
             |       ${prSql("CAST(p.n_ab * nb.nbaskets AS DOUBLE) / (sa.ns * sb.ns)", 6)} AS lift
             |FROM p JOIN s sa ON sa.event_type = p.a
             |       JOIN s sb ON sb.event_type = p.b, nb
             |ORDER BY n_ab DESC, a, b""".stripMargin))

  // ------------------------------------------------- DoReMi reweighting
  /** One exponentiated-gradient domain-reweighting step (DoReMi, Xie et
    * al. NeurIPS'23) driven by each domain's excess loss under the
    * GLOBAL unigram LM: domains whose token distribution diverges from
    * the corpus read as higher-loss and get upweighted —
    * w_d = (1−ε)·exp(ℓ_d − ℓ_min)/Z + ε/|D| with ε = 0.1. Loss terms
    * −ln(c_t/N) floor-round to 8dp and sum through DECIMAL(20,12)
    * (order-independent); exp(·) floor-rounds to 8dp into DECIMAL(18,8)
    * so Z is exact; the final affine map is a fixed IEEE op sequence on
    * exact inputs, floor-rounded 6dp. Scale shape: one token explode,
    * one vocab groupBy, one broadcast join back, one per-domain reduce —
    * the softmax runs on the |domains|-row table. */
  val mixDoremi = QueryDef(
    "q_mix_doremi",
    (s, dir) => {
      import s.implicits._
      val toks = TextOps.spread(Tables(s, dir, "documents"))
        .select($"source", explode(TextOps.tokens($"text")).as("w"))
      val uni = toks.groupBy($"w").agg(count(lit(1)).as("c"))
      val nTot = uni.agg(sum($"c").as("ntot"))
      val byDom = toks
        .join(broadcast(uni), "w")
        .crossJoin(broadcast(nTot))
        .withColumn("nll", pr(-log($"c" / $"ntot"), 8).cast(DecimalType(20, 12)))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_tokens"), sum($"nll").as("snll"))
        .withColumn("loss", pr($"snll".cast("double") / $"n_tokens", 8))
      val mn = byDom.agg(min($"loss").as("lmin"),
        count(lit(1)).as("nd"))
      val wraw = byDom.crossJoin(broadcast(mn))
        .withColumn("wraw", pr(exp($"loss" - $"lmin"), 8)
          .cast(DecimalType(18, 8)))
      val z = wraw.agg(sum($"wraw").as("z"))
      wraw.crossJoin(broadcast(z))
        .select($"source", $"n_tokens", $"loss",
          pr(lit(0.9) * ($"wraw".cast("double") / $"z".cast("double")) +
            lit(0.1) / $"nd", 6).as("weight"))
        .orderBy($"source")
    },
    Some(s"""WITH t AS (SELECT source, unnest($toksSql) AS w FROM documents),
             |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY w),
             |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS ntot FROM uni),
             |dom AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |               SUM(CAST(${prSql("-ln(1.0 * c / ntot)", 8)} AS DECIMAL(20,12))) AS snll
             |        FROM t JOIN uni USING (w), nt GROUP BY source),
             |l AS (SELECT source, n_tokens,
             |             ${prSql("CAST(snll AS DOUBLE) / n_tokens", 8)} AS loss
             |      FROM dom),
             |mn AS (SELECT MIN(loss) AS lmin, CAST(COUNT(*) AS BIGINT) AS nd FROM l),
             |wr AS (SELECT source, n_tokens, loss,
             |              CAST(${prSql("exp(loss - lmin)", 8)} AS DECIMAL(18,8)) AS wraw
             |       FROM l, mn),
             |z AS (SELECT SUM(wraw) AS z FROM wr)
             |SELECT source, n_tokens, loss,
             |       ${prSql("0.9 * (CAST(wraw AS DOUBLE) / CAST(z.z AS DOUBLE)) + 0.1 / mn.nd", 6)} AS weight
             |FROM wr, z, mn ORDER BY source""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(statsBootstrap, eventsSurvival, eventsItemsets, mixDoremi)
}
