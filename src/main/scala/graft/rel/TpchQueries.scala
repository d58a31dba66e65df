package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryDef, Tables}

/** The remaining 16 TPC-H query *shapes* (Q2, Q4, Q7–Q9, Q11–Q17, Q19–Q22),
  * adapted to the fixture star schema (TESTDATA.md) — it has no `partsupp`
  * table and fewer columns than tpch-dbgen (no l_shipmode / l_commitdate /
  * l_receiptdate, no p_container / p_mfgr, no c_phone), so the queries that
  * touch those keep the canonical PLAN SHAPE (the thing Catalyst has to get
  * right: correlated EXISTS, groupwise-min, scalar-subquery thresholds,
  * disjunctive pushdown, distinct-count anti-join) over the columns that do
  * exist. Together with q_tpch_q1/q3/q5/q6/q10/q18 (ExtQueries / q1_agg)
  * this declares all 22 TPC-H shapes.
  *
  * Float discipline per CLAUDE.md: every order-sensitive money sum goes
  * through DECIMAL(18,2/4) on both engines; ratios divide two exact-decimal-
  * backed doubles (one IEEE op, bit-identical in both engines) and round to
  * 6 places before emission.
  */
object TpchQueries {

  private def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** TPC-H Q2 shape (minimum-cost supplier): with no partsupp, the "offer"
    * is each supplier's cheapest historical sale price of the part
    * (min l_extendedprice — exact under DECIMAL, so the groupwise-min
    * equality join back is float-safe). Region filter prunes suppliers
    * before the offer aggregation; the best-offer-per-part table joins back
    * on (partkey, offer) equality — the classic groupwise-min plan. */
  val tpchQ2 = QueryDef(
    "q_tpch_q2",
    (s, dir) => {
      import s.implicits._
      val eurSupp = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables(s, dir, "region").filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      val offers = Tables(s, dir, "lineitem")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min(dec2($"l_extendedprice")).cast("double").as("offer"))
      val eligible = offers
        .join(broadcast(eurSupp), $"l_suppkey" === $"s_suppkey")
      val best = eligible.groupBy($"l_partkey".as("b_partkey"))
        .agg(min($"offer").as("min_offer"))
      eligible
        .join(best, $"l_partkey" === $"b_partkey" && $"offer" === $"min_offer")
        .join(broadcast(Tables(s, dir, "part")
          .filter($"p_size" === 15 && $"p_type" === "STANDARD")),
          $"l_partkey" === $"p_partkey")
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_type", $"offer")
        .orderBy($"s_acctbal".desc, $"p_partkey", $"s_name")
        .limit(100)
    },
    Some("""WITH offers AS (
              SELECT l_partkey, l_suppkey,
                     CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS offer
              FROM lineitem GROUP BY l_partkey, l_suppkey),
            eligible AS (
              SELECT o.l_partkey, o.offer, s.s_acctbal, s.s_name, n.n_name
              FROM offers o
              JOIN supplier s ON o.l_suppkey = s.s_suppkey
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              WHERE r.r_name = 'EUROPE'),
            best AS (SELECT l_partkey, MIN(offer) AS min_offer
                     FROM eligible GROUP BY l_partkey)
            SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type, e.offer
            FROM eligible e
            JOIN best b ON e.l_partkey = b.l_partkey AND e.offer = b.min_offer
            JOIN part p ON e.l_partkey = p.p_partkey
            WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
            ORDER BY e.s_acctbal DESC, p.p_partkey, e.s_name LIMIT 100"""))

  /** TPC-H Q4 shape (order-priority checking): correlated EXISTS over the
    * fact — Catalyst plans the condition-carrying left-semi join; with no
    * l_commitdate/l_receiptdate, "late" is shipping > 60 days after the
    * order date. The quarter filter pushes to the orders scan. */
  val tpchQ4 = QueryDef(
    "q_tpch_q4",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
      o.join(l, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-04-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q7 shape (volume shipping): the nation-pair disjunction forces
    * the join to keep both orientations; nation joins twice under different
    * roles (supplier vs customer side), both broadcast. Revenue per
    * (supp_nation, cust_nation, year). */
  val tpchQ7 = QueryDef(
    "q_tpch_q7",
    (s, dir) => {
      import s.implicits._
      val sn = Tables(s, dir, "nation")
        .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
      val cn = Tables(s, dir, "nation")
        .select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables(s, dir, "customer").select($"c_custkey", $"c_nationkey")),
          $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey")
        .join(broadcast(sn), $"s_nationkey" === $"sn_key")
        .join(broadcast(cn), $"c_nationkey" === $"cn_key")
        .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
          ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
        .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
        .agg(sum(dec4($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .cast("double").as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   CAST(SUM(CAST(l_extendedprice * (1.0::DOUBLE - l_discount)
                                 AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
                OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** TPC-H Q8 shape (national market share): seven-table join feeding a
    * conditional-share aggregate. Both sums stay DECIMAL until the final
    * single IEEE division; round(…,6) before emission per the float
    * discipline. */
  val tpchQ8 = QueryDef(
    "q_tpch_q8",
    (s, dir) => {
      import s.implicits._
      val cn = Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region").filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("cn_key"))
      val sn = Tables(s, dir, "nation")
        .select($"n_nationkey".as("sn_key"), $"n_name".as("nation"))
      val zero = lit(0).cast(DecimalType(18, 4))
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part").filter($"p_type" === "ECONOMY")
          .select($"p_partkey")), $"l_partkey" === $"p_partkey")
        .join(Tables(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
          .select($"o_orderkey", $"o_custkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables(s, dir, "customer").select($"c_custkey", $"c_nationkey")),
          $"o_custkey" === $"c_custkey")
        .join(broadcast(cn), $"c_nationkey" === $"cn_key")
        .join(broadcast(Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey")
        .join(broadcast(sn), $"s_nationkey" === $"sn_key")
        .select(year($"o_orderdate").as("o_year"),
          dec4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("volume"),
          $"nation")
        .groupBy($"o_year")
        .agg(round(
          sum(when($"nation" === "NATION_4", $"volume").otherwise(zero)).cast("double") /
            sum($"volume").cast("double"), 6).as("mkt_share"))
        .orderBy($"o_year")
    },
    Some("""WITH all_nations AS (
              SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                     CAST(l_extendedprice * (1.0::DOUBLE - l_discount)
                          AS DECIMAL(18,4)) AS volume,
                     sn.n_name AS nation
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN region ON cn.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
              WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01')
            SELECT o_year,
                   round(CAST(SUM(CASE WHEN nation = 'NATION_4' THEN volume
                                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                         / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
            FROM all_nations GROUP BY o_year ORDER BY o_year"""))

  /** TPC-H Q9 shape (product-type profit): profit = revenue − cost, with
    * p_retailprice×quantity×0.1 standing in for ps_supplycost; the
    * substring part filter (`p_name LIKE '%a%'`) is the unpushable-predicate
    * stressor of the original. Grouped by supplier nation × order year. */
  val tpchQ9 = QueryDef(
    "q_tpch_q9",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part").filter($"p_name".contains("a"))
          .select($"p_partkey", $"p_retailprice")), $"l_partkey" === $"p_partkey")
        .join(broadcast(Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey")
        .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables(s, dir, "nation").select($"n_nationkey", $"n_name")),
          $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name".as("nation"), year($"o_orderdate").as("o_year"))
        .agg(sum(dec4($"l_extendedprice" * (lit(1.0) - $"l_discount") -
          lit(0.1) * $"p_retailprice" * $"l_quantity"))
          .cast("double").as("sum_profit"))
        .orderBy($"nation", $"o_year".desc)
    },
    Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(SUM(CAST(l_extendedprice * (1.0::DOUBLE - l_discount)
                                 - 0.1::DOUBLE * p_retailprice * l_quantity
                                 AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%a%'
            GROUP BY 1, 2 ORDER BY nation, o_year DESC"""))

  /** TPC-H Q11 shape (important stock): per-part value from one region's
    * suppliers, kept only where it exceeds a scalar-subquery fraction of
    * the total — the aggregate-vs-total-threshold plan. The total re-sums
    * the DECIMAL per-part values (associative), and both sides compare as
    * doubles derived from exact decimals. */
  val tpchQ11 = QueryDef(
    "q_tpch_q11",
    (s, dir) => {
      import s.implicits._
      val asiaSupp = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables(s, dir, "region").filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey")
      val vals = Tables(s, dir, "lineitem")
        .join(broadcast(asiaSupp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"l_partkey")
        .agg(sum(dec2($"l_extendedprice")).as("value_dec"))
      val total = vals.agg(sum($"value_dec").cast("double").as("total"))
      vals.join(broadcast(total))
        .filter($"value_dec".cast("double") > $"total" * 0.001)
        .select($"l_partkey".as("p_key"), $"value_dec".cast("double").as("value"))
        .orderBy($"value".desc, $"p_key")
    },
    Some("""WITH vals AS (
              SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
              GROUP BY l_partkey)
            SELECT l_partkey AS p_key, CAST(value_dec AS DOUBLE) AS value
            FROM vals
            WHERE CAST(value_dec AS DOUBLE) >
                  (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM vals) * 0.001::DOUBLE
            ORDER BY value DESC, p_key"""))

  /** TPC-H Q12 shape (shipping-priority conditional counts): with no
    * l_shipmode, the bucket is late-vs-ontime shipment; the CASE-pair
    * aggregation over the orders⋈lineitem join is the shape. */
  val tpchQ12 = QueryDef(
    "q_tpch_q12",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders").select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .join(Tables(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
          .select($"l_orderkey", $"l_shipdate"),
          $"o_orderkey" === $"l_orderkey")
        .select(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 45 DAYS"), "LATE")
          .otherwise("ONTIME").as("ship_bucket"), $"o_orderpriority")
        .groupBy($"ship_bucket")
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy($"ship_bucket")
    },
    Some("""SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
                        THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1 ORDER BY 1"""))

  /** TPC-H Q13 shape (customer order-count distribution): outer join that
    * must preserve zero-order customers, then a second aggregation over the
    * first's result — the double-agg distribution plan. The join-side filter
    * lives in the join condition, not a WHERE (the Q13 trap). */
  val tpchQ13 = QueryDef(
    "q_tpch_q13",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey", $"o_orderpriority")
      Tables(s, dir, "customer").select($"c_custkey")
        .join(o, $"c_custkey" === $"o_custkey" && $"o_orderpriority" =!= "5-LOW", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },
    Some("""WITH c_orders AS (
              SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
              FROM customer
              LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
              GROUP BY c_custkey)
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM c_orders GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q14 shape (promo revenue): single-row conditional-share over one
    * shipdate month; the part join broadcasts, the month filter pushes to
    * the fact scan. */
  val tpchQ14 = QueryDef(
    "q_tpch_q14",
    (s, dir) => {
      import s.implicits._
      val zero = lit(0).cast(DecimalType(18, 4))
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-03-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
        .join(broadcast(Tables(s, dir, "part").select($"p_partkey", $"p_type")),
          $"l_partkey" === $"p_partkey")
        .select($"p_type",
          dec4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
        .agg(round(lit(100.0) *
          sum(when($"p_type" === "PROMO", $"rev").otherwise(zero)).cast("double") /
          sum($"rev").cast("double"), 6).as("promo_revenue"))
    },
    Some("""SELECT round(100.0::DOUBLE *
                   CAST(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN CAST(l_extendedprice * (1.0::DOUBLE - l_discount)
                                           AS DECIMAL(18,4))
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice * (1.0::DOUBLE - l_discount)
                                   AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-03-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'"""))

  /** TPC-H Q15 shape (top supplier): the revenue view joins back against
    * its own scalar max — equality on doubles is safe because both engines
    * derive them from the identical DECIMAL sum. */
  val tpchQ15 = QueryDef(
    "q_tpch_q15",
    (s, dir) => {
      import s.implicits._
      val revenue = Tables(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(sum(dec4($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .cast("double").as("total_revenue"))
      val best = revenue.agg(max($"total_revenue").as("max_revenue"))
      Tables(s, dir, "supplier").select($"s_suppkey", $"s_name")
        .join(revenue, $"s_suppkey" === $"l_suppkey")
        .join(broadcast(best))
        .filter($"total_revenue" === $"max_revenue")
        .select($"s_suppkey", $"s_name", $"total_revenue")
        .orderBy($"s_suppkey")
    },
    Some("""WITH revenue AS (
              SELECT l_suppkey AS supplier_no,
                     CAST(SUM(CAST(l_extendedprice * (1.0::DOUBLE - l_discount)
                                   AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1997-04-01'
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
            ORDER BY s_suppkey"""))

  /** TPC-H Q16 shape (supplier relationship count): distinct-supplier count
    * per part attribute triple, excluding a NOT-IN supplier set (planned as
    * a left-anti join — keys are non-null so the semantics coincide). The
    * size IN-list prunes the broadcast part side. */
  val tpchQ16 = QueryDef(
    "q_tpch_q16",
    (s, dir) => {
      import s.implicits._
      val badSupp = Tables(s, dir, "supplier")
        .filter($"s_acctbal" < 0.0).select($"s_suppkey")
      Tables(s, dir, "lineitem").select($"l_partkey", $"l_suppkey")
        .join(broadcast(Tables(s, dir, "part")
          .filter($"p_brand" =!= "Brand#45" && $"p_type" =!= "MEDIUM" &&
            $"p_size".isin(1, 14, 23, 45, 19, 3, 36, 9))
          .select($"p_partkey", $"p_brand", $"p_type", $"p_size")),
          $"l_partkey" === $"p_partkey")
        .join(broadcast(badSupp), $"l_suppkey" === $"s_suppkey", "left_anti")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    },
    Some("""SELECT p_brand, p_type, p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
              AND p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0.0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** TPC-H Q17 shape (small-quantity revenue): the correlated per-part
    * average decorrelates into a per-part aggregate joined back to the
    * fact. The average divides an exact DECIMAL sum by the BIGINT count —
    * one IEEE division on both engines, so the `<` threshold can't flip. */
  val tpchQ17 = QueryDef(
    "q_tpch_q17",
    (s, dir) => {
      import s.implicits._
      val pavg = Tables(s, dir, "lineitem")
        .groupBy($"l_partkey".as("a_partkey"))
        .agg((sum(dec2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part").filter($"p_brand" === "Brand#11")
          .select($"p_partkey")), $"l_partkey" === $"p_partkey")
        .join(pavg, $"l_partkey" === $"a_partkey")
        .filter($"l_quantity" < lit(0.5) * $"avg_qty")
        .agg(round(sum(dec2($"l_extendedprice")).cast("double") / 7.0, 6).as("avg_yearly"),
          count(lit(1)).as("n"))
    },
    Some("""WITH pavg AS (
              SELECT l_partkey AS a_partkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                       AS avg_qty
              FROM lineitem GROUP BY l_partkey)
            SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                         / 7.0::DOUBLE, 6) AS avg_yearly,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN pavg ON l_partkey = a_partkey
            WHERE p_brand = 'Brand#11' AND l_quantity < 0.5::DOUBLE * avg_qty"""))

  /** TPC-H Q19 shape (discounted revenue): the OR-of-ANDs predicate across
    * both join sides — the disjunctive-pushdown stressor; Catalyst extracts
    * the common `p_partkey = l_partkey` conjunct so the join stays an
    * equi-join with the disjunction as a post-filter. */
  val tpchQ19 = QueryDef(
    "q_tpch_q19",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")
          .select($"p_partkey", $"p_brand", $"p_size")), $"p_partkey" === $"l_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
            $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
            $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#34" && $"p_size".between(1, 15) &&
            $"l_quantity".between(20, 30)))
        .agg(sum(dec4($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice * (1.0::DOUBLE - l_discount)
                                 AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)"""))

  /** TPC-H Q20 shape (potential part promotion): nested IN-chains —
    * parts-by-name → fact aggregate HAVING → supplier semi join. Each level
    * decorrelates to a semi join; the part filter broadcasts. */
  val tpchQ20 = QueryDef(
    "q_tpch_q20",
    (s, dir) => {
      import s.implicits._
      val redParts = Tables(s, dir, "part")
        .filter($"p_name".startsWith("red")).select($"p_partkey")
      val bigShippers = Tables(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(redParts), $"l_partkey" === $"p_partkey", "left_semi")
        .groupBy($"l_suppkey")
        .agg(sum(dec2($"l_quantity")).as("qty"))
        .filter($"qty" > 100)
        .select($"l_suppkey")
      Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(bigShippers, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name", $"n_name")
        .orderBy($"s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
              SELECT l_suppkey FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
                AND l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY l_suppkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
            ORDER BY s_suppkey"""))

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the EXISTS /
    * NOT-EXISTS double self-join, re-expressed for scale as ONE per-order
    * aggregate — distinct suppliers and distinct LATE suppliers per order —
    * so the fact self-joins once instead of twice. A late line qualifies
    * iff its order has ≥2 suppliers and exactly one late supplier (itself).
    * The oracle keeps the canonical correlated form; equality of the two
    * formulations is the point of the check. */
  val tpchQ21 = QueryDef(
    "q_tpch_q21",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
        .filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate")
      val l = Tables(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        .join(o, $"l_orderkey" === $"o_orderkey")
        .withColumn("late", $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 45 DAYS"))
      val stats = l.groupBy($"l_orderkey".as("st_orderkey"))
        .agg(countDistinct($"l_suppkey").as("n_supp"),
          countDistinct(when($"late", $"l_suppkey")).as("n_late_supp"))
      l.filter($"late")
        .join(stats, $"l_orderkey" === $"st_orderkey")
        .filter($"n_supp" > 1 && $"n_late_supp" === 1)
        .join(broadcast(Tables(s, dir, "supplier").select($"s_suppkey", $"s_name")),
          $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(20)
    },
    Some("""SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
            FROM supplier
            JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
            JOIN orders ON o_orderkey = l1.l_orderkey
            WHERE o_orderstatus = 'F'
              AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_shipdate > o_orderdate + INTERVAL 45 DAY)
            GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** TPC-H Q22 shape (global sales opportunity): scalar-subquery average
    * (exact decimal sum ÷ count), a NOT-EXISTS anti join against recent
    * orders, and a nation-bucket rollup — c_nationkey % 5 stands in for the
    * phone country code. */
  val tpchQ22 = QueryDef(
    "q_tpch_q22",
    (s, dir) => {
      import s.implicits._
      val bucket = ($"c_nationkey" % 5).cast("int")
      val inBuckets = Tables(s, dir, "customer")
        .filter(bucket.isin(1, 2, 3))
      val avgBal = inBuckets.filter($"c_acctbal" > 0.0)
        .agg((sum(dec2($"c_acctbal")).cast("double") / count(lit(1))).as("a"))
      val recent = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
        .select($"o_custkey")
      inBuckets
        .join(broadcast(avgBal))
        .filter($"c_acctbal" > $"a")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy(bucket.as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec2($"c_acctbal")).cast("double").as("totacctbal"))
        .orderBy($"cntrycode")
    },
    Some("""WITH avg_bal AS (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
              FROM customer
              WHERE c_acctbal > 0.0::DOUBLE AND c_nationkey % 5 IN (1, 2, 3))
            SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
                   CAST(COUNT(*) AS BIGINT) AS numcust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
            FROM customer
            WHERE c_nationkey % 5 IN (1, 2, 3)
              AND c_acctbal > (SELECT a FROM avg_bal)
              AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '1999-01-01')
            GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(
    tpchQ2, tpchQ4, tpchQ7, tpchQ8, tpchQ9, tpchQ11, tpchQ12, tpchQ13,
    tpchQ14, tpchQ15, tpchQ16, tpchQ17, tpchQ19, tpchQ20, tpchQ21, tpchQ22)
}
