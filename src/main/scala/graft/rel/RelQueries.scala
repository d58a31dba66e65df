package graft.rel

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Declared relational operator suite — SURVEY.md §2.B categories 1–8.
  *
  * Every query is deterministic (explicit ORDER BY incl. tie-break keys) and
  * float-safe for hash comparison against the DuckDB oracle: order-sensitive
  * double sums go through DECIMAL(18,s) (exact, associative in both engines)
  * and come back as doubles; pure scalar double arithmetic is IEEE-identical
  * in both engines so it passes through raw.
  *
  * Scale notes (100 TB): all plans here are single-shuffle shapes — scans with
  * pushed filters + projected columns, partial/final hash aggregation, one
  * shuffle per join/window keyed on the join/partition key. Dimension tables
  * (customer/part/nation) are broadcast; fact-fact joins shuffle on the key.
  */
object RelQueries {

  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  // ---------------------------------------------------------------- cat 1: scan
  /** Full scan + projection (reference: SQLite full scans, app.py:215-229). */
  val scanProject = QueryDef(
    "q_scan_project",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  // ------------------------------------------------------------- cat 2: filters
  /** Predicate + projection; Catalyst pushes both into the parquet scan
    * (reference post-filters after full scan, app.py:427-435 — we don't). */
  val filterPred = QueryDef(
    "q_filter_pred",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 25.0)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05::DOUBLE AND 0.07::DOUBLE
              AND l_quantity < 25.0::DOUBLE
            ORDER BY l_orderkey, l_linenumber"""))

  /** JSON predicate on a dynamic column (reference metadata filter analog,
    * app.py:428-435): exact-match semantics over `events.props`. */
  val filterJson = QueryDef(
    "q_filter_json",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .filter($"event_type" === "purchase" && $"k" % 10 === 0)
        .select($"event_id", $"user_id", $"k")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
            WHERE event_type = 'purchase'
              AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0
            ORDER BY event_id"""))

  // --------------------------------------------------------------- cat 3: joins
  /** Inner equi-join, fact⋈dim (reference dict hash-join, app.py:419-424). */
  val joinInner = QueryDef(
    "q_join_inner",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select($"o_orderkey", $"c_name", $"c_mktsegment", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey"""))

  /** Broadcast join: part is dimension-sized at every SF → explicit
    * broadcast hint keeps this shuffle-free on the fact side at 100 TB. */
  val joinBroadcast = QueryDef(
    "q_join_broadcast",
    (s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
      val p  = Tables(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .select($"l_orderkey", $"l_linenumber", $"p_brand",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, p_brand,
                   l_extendedprice * (1.0::DOUBLE - l_discount) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            ORDER BY l_orderkey, l_linenumber"""))

  /** Left outer join (reference: node enrich keeps nodes without edges,
    * app.py:187-197). NULLS FIRST pinned to Spark's asc default. */
  val joinLeft = QueryDef(
    "q_join_left",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice")
        .orderBy($"c_custkey", $"o_orderkey")
    },
    Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            ORDER BY c_custkey, o_orderkey NULLS FIRST"""))

  /** Left-semi join — EXISTS (reference endpoint-existence check,
    * app.py:843-846). */
  val joinSemi = QueryDef(
    "q_join_semi",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  /** Left-anti join — NOT EXISTS (reference cascade delete shape, O4).
    * Every customer has orders in the fixtures, so the anti side is
    * predicated (>250k) to keep the result non-empty at every SF. */
  val joinAnti = QueryDef(
    "q_join_anti",
    (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter($"o_totalprice" > 250000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_totalprice > 250000.0::DOUBLE)
            ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- cat 4: aggs
  /** TPC-H Q1-shaped groupBy-agg (sum/avg/count); Catalyst runs it
    * partial+final so the shuffle carries one row per group per task. */
  val q1Agg = QueryDef(
    "q1_agg",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sum(dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec4($"l_extendedprice" * (lit(1.0) - $"l_discount")))
            .cast("double").as("sum_disc_price"),
          (sum(dec2($"l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice * (1.0::DOUBLE - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** Distinct aggregates (count distinct forces an extra expand/shuffle —
    * Catalyst plans it as a two-phase distinct agg). */
  val aggDistinct = QueryDef(
    "q_agg_distinct",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_suppkey").as("cd_supp"),
          countDistinct($"l_partkey").as("cd_part"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   COUNT(DISTINCT l_suppkey) AS cd_supp,
                   COUNT(DISTINCT l_partkey) AS cd_part,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private def nationCustomer(s: SparkSession, dir: String): DataFrame = {
    val n = Tables(s, dir, "nation")
    val c = Tables(s, dir, "customer")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
  }

  /** ROLLUP over nation⋈customer. */
  val rollupAgg = QueryDef(
    "q_rollup",
    (s, dir) => {
      import s.implicits._
      nationCustomer(s, dir)
        .rollup($"n_name", $"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(dec2($"c_acctbal")).cast("double").as("acct"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
    },
    Some("""SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY ROLLUP(n_name, c_mktsegment)
            ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST"""))

  /** CUBE over the same shape. */
  val cubeAgg = QueryDef(
    "q_cube",
    (s, dir) => {
      import s.implicits._
      nationCustomer(s, dir)
        .cube($"n_name", $"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(dec2($"c_acctbal")).cast("double").as("acct"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
    },
    Some("""SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acct
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY CUBE(n_name, c_mktsegment)
            ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST"""))

  /** GROUPING SETS (SQL form — same Catalyst Expand-based plan as rollup). */
  val groupingSets = QueryDef.sqlBoth(
    "q_grouping_sets",
    """SELECT n_name, c_mktsegment, COUNT(*) AS n_cust
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
       ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""",
    """SELECT n_name, c_mktsegment, COUNT(*) AS n_cust
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
       ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""")

  // ------------------------------------------------------------ cat 5: windows
  /** rank/row_number per partition (reference has only global ranking;
    * partitioned ranking is its per-customer generalization). */
  val windowRank = QueryDef(
    "q_window_rank",
    (s, dir) => {
      import s.implicits._
      val byDate = Window.partitionBy($"o_custkey").orderBy($"o_orderdate")
      val byDateKey = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables(s, dir, "orders")
        .withColumn("rnk", rank().over(byDate))
        .withColumn("rn", row_number().over(byDateKey))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"rnk", $"rn")
        .orderBy($"o_custkey", $"rn")
    },
    Some("""SELECT o_custkey, o_orderkey, CAST(rnk AS INT) AS rnk, CAST(rn AS INT) AS rn FROM (
              SELECT o_custkey, o_orderkey,
                     RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rnk,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders) t
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Running sum per user over the event stream (rowsBetween unbounded
    * preceding → current). DECIMAL accumulation keeps it engine-exact. */
  val windowRunning = QueryDef(
    "q_window_running",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("running", sum(dec2($"value")).over(w).cast("double"))
        .select($"user_id", $"event_id", $"running")
        .orderBy($"user_id", $"event_id")
    },
    Some("""SELECT user_id, event_id,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
            FROM events ORDER BY user_id, event_id"""))

  /** Whole-partition max — the graph-score normalization shape
    * (max over the visited set, app.py:577-585) as a window. */
  val windowMax = QueryDef(
    "q_window_max",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
      Tables(s, dir, "orders")
        .withColumn("cust_max", max($"o_totalprice").over(w))
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"cust_max")
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
                   MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_max
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  // ------------------------------------------------------- cat 6: sort / top-k
  /** Global top-k — Spark plans orderBy+limit as TakeOrderedAndProject
    * (per-partition heaps, no full sort — the scalable form of the
    * reference's sort-then-truncate, app.py:416,441-442). */
  val topK = QueryDef(
    "q_topk",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  // ------------------------------------------------------------ cat 7: set ops
  val unionAll = QueryDef(
    "q_union_all",
    (s, dir) => {
      import s.implicits._
      val a = Tables(s, dir, "orders").select($"o_custkey".as("k"))
      val b = Tables(s, dir, "customer").select($"c_custkey".as("k"))
      a.unionByName(b).orderBy($"k")
    },
    Some("""SELECT k FROM (
              SELECT o_custkey AS k FROM orders
              UNION ALL SELECT c_custkey AS k FROM customer) t ORDER BY k"""))

  val intersectOp = QueryDef(
    "q_intersect",
    (s, dir) => {
      import s.implicits._
      val a = Tables(s, dir, "customer").select($"c_custkey".as("k"))
      val b = Tables(s, dir, "orders").select($"o_custkey".as("k"))
      a.intersect(b).orderBy($"k")
    },
    Some("""SELECT c_custkey AS k FROM customer
            INTERSECT SELECT o_custkey AS k FROM orders ORDER BY k"""))

  val exceptOp = QueryDef(
    "q_except",
    (s, dir) => {
      import s.implicits._
      val a = Tables(s, dir, "customer").select($"c_custkey".as("k"))
      val b = Tables(s, dir, "orders")
        .filter($"o_totalprice" > 250000.0).select($"o_custkey".as("k"))
      a.except(b).orderBy($"k")
    },
    Some("""SELECT c_custkey AS k FROM customer
            EXCEPT SELECT o_custkey AS k FROM orders
                   WHERE o_totalprice > 250000.0::DOUBLE
            ORDER BY k"""))

  // ------------------------------------------------------ cat 8: scalar functions
  /** String functions (reference: lower/split tokenization, app.py:365-366). */
  val fnString = QueryDef(
    "q_fn_string",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "part")
        .select(
          $"p_partkey",
          lower($"p_name").as("lname"),
          length($"p_name").as("len"),
          concat($"p_brand", lit("#"), $"p_type").as("tag"),
          substring($"p_name", 1, 5).as("pre"),
          element_at(split($"p_name", " "), 1).as("tok0"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey, lower(p_name) AS lname, CAST(length(p_name) AS INT) AS len,
                   p_brand || '#' || p_type AS tag,
                   substr(p_name, 1, 5) AS pre,
                   string_split(p_name, ' ')[1] AS tok0
            FROM part ORDER BY p_partkey"""))

  /** Date/time functions — outputs as strings to dodge physical-type drift. */
  val fnDate = QueryDef(
    "q_fn_date",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("ds"),
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INT) AS y,
                   CAST(month(o_orderdate) AS INT) AS m,
                   CAST(day(o_orderdate) AS INT) AS d,
                   strftime(o_orderdate, '%Y-%m-%d') AS ds,
                   strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
            FROM orders ORDER BY o_orderkey"""))

  /** Math functions; ln/sqrt rounded to 6dp (libm last-ulp insurance). */
  val fnMath = QueryDef(
    "q_fn_math",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .select(
          $"l_orderkey", $"l_linenumber",
          // /3 can never produce an exact .xx5 half-boundary (x*200 = 3*odd is
          // unsolvable), so double-vs-decimal rounding paths agree in both engines
          round($"l_extendedprice" / 3.0, 2).as("r1"),
          abs($"l_discount" - 0.05).as("adisc"),
          round(sqrt($"l_quantity"), 6).as("sq"),
          round(log($"l_extendedprice"), 6).as("lg"),
          ($"l_quantity" * $"l_quantity").as("q2"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice / 3.0::DOUBLE, 2) AS r1,
                   abs(l_discount - 0.05::DOUBLE) AS adisc,
                   round(sqrt(l_quantity), 6) AS sq,
                   round(ln(l_extendedprice), 6) AS lg,
                   l_quantity * l_quantity AS q2
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Array functions over the embedding column (size / element / max /
    * fold-sum / L2 norm) — the scalar toolkit under the vector operators. */
  val fnArray = QueryDef(
    "q_fn_array",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "embeddings")
        .select(
          $"vec_id",
          size($"embedding").as("dim"),
          element_at($"embedding", 1).cast("double").as("first"),
          array_max($"embedding").cast("double").as("vmax"),
          round(aggregate($"embedding", lit(0.0),
            (acc, x) => acc + x.cast("double")), 6).as("vsum"),
          round(sqrt(aggregate($"embedding", lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), 6).as("l2"))
        .orderBy($"vec_id")
    },
    Some("""SELECT vec_id,
                   CAST(len(embedding) AS INT) AS dim,
                   CAST(embedding[1] AS DOUBLE) AS first,
                   CAST(list_max(embedding) AS DOUBLE) AS vmax,
                   round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS vsum,
                   round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[]))), 6) AS l2
            FROM embeddings ORDER BY vec_id"""))

  /** Map/JSON extraction + conditional logic over events.props. */
  val fnJson = QueryDef(
    "q_fn_json",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .select(
          $"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"),
          (get_json_object($"props", "$.k").cast("long") % 7).as("bucket"),
          when($"event_type" === "purchase", lit("buy"))
            .when($"event_type" === "signup", lit("new"))
            .otherwise(lit("other")).as("kind"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS bucket,
                   CASE WHEN event_type = 'purchase' THEN 'buy'
                        WHEN event_type = 'signup' THEN 'new'
                        ELSE 'other' END AS kind
            FROM events ORDER BY event_id"""))

  /** Correlated scalar subquery — Catalyst decorrelates it into a left
    * outer aggregate join (SURVEY §4: subquery decorrelation "free"). */
  val scalarSubquery = QueryDef.sqlBoth(
    "q_scalar_subquery",
    """SELECT c_custkey, c_name,
              (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
       FROM customer ORDER BY c_custkey""",
    """SELECT c_custkey, c_name,
              (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
       FROM customer ORDER BY c_custkey""")

  /** NULL-handling scalars: coalesce / nullif / greatest / least. */
  val fnNull = QueryDef(
    "q_fn_null",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select(
          $"o_orderkey",
          coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("st"),
          greatest($"o_totalprice", lit(50000.0)).as("g"),
          least($"o_totalprice", lit(50000.0)).as("l"),
          when($"o_totalprice".isNull, 0.0).otherwise($"o_totalprice").as("nz"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st,
                   greatest(o_totalprice, 50000.0::DOUBLE) AS g,
                   least(o_totalprice, 50000.0::DOUBLE) AS l,
                   CASE WHEN o_totalprice IS NULL THEN 0.0 ELSE o_totalprice END AS nz
            FROM orders ORDER BY o_orderkey"""))

  /** lag/lead navigation within a partition (with explicit default). */
  val windowLag = QueryDef(
    "q_window_lag",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1, -1.0).over(w).as("next_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
                   lag(o_totalprice) OVER w AS prev_price,
                   lead(o_totalprice, 1, -1.0::DOUBLE) OVER w AS next_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  /** Pivot — groupBy + pivot with pinned values; absent combos coalesced
    * to 0 to match the FILTER-count oracle formulation. */
  val pivotQ = QueryDef(
    "q_pivot",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)))
        .select($"l_linestatus",
          coalesce($"A", lit(0L)).as("r_a"),
          coalesce($"N", lit(0L)).as("r_n"),
          coalesce($"R", lit(0L)).as("r_r"))
        .orderBy($"l_linestatus")
    },
    Some("""SELECT l_linestatus,
                   COUNT(*) FILTER (l_returnflag = 'A') AS r_a,
                   COUNT(*) FILTER (l_returnflag = 'N') AS r_n,
                   COUNT(*) FILTER (l_returnflag = 'R') AS r_r
            FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** Lateral explode with position (generator / UNNEST WITH ORDINALITY). */
  val explodePos = QueryDef(
    "q_explode_pos",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" < 10)
        .select($"doc_id", posexplode(graft.pipeline.TextOps.tokens($"text")))
        .select($"doc_id", $"pos", $"col".as("tok"))
        .orderBy($"doc_id", $"pos")
    },
    Some("""WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS toks
              FROM documents WHERE doc_id < 10)
            SELECT doc_id, CAST(u.j AS INT) AS pos, toks[u.j + 1] AS tok
            FROM t, unnest(range(len(toks))) AS u(j)
            ORDER BY doc_id, pos"""))

  /** Regexp functions: extract / replace / match over part names. */
  val fnRegexp = QueryDef(
    "q_fn_regexp",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "part")
        .select(
          $"p_partkey",
          regexp_extract($"p_name", "([a-z]+)_([0-9]+)", 2).as("name_num"),
          regexp_replace($"p_name", "[0-9]+", "#").as("masked"),
          $"p_name".rlike("[02468]$").as("even_suffix"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
                   coalesce(regexp_extract(p_name, '([a-z]+)_([0-9]+)', 2), '') AS name_num,
                   regexp_replace(p_name, '[0-9]+', '#', 'g') AS masked,
                   regexp_matches(p_name, '[02468]$') AS even_suffix
            FROM part ORDER BY p_partkey"""))

  /** Sketch aggregates: HyperLogLog++ distinct counts and t-digest-style
    * quantiles. Deterministic within Spark (merge is order-independent)
    * but sketch implementations differ across engines → declared
    * rows-only; exactness is covered by q_agg_distinct's true distincts. */
  val sketchAgg = QueryDef(
    "q_sketch_agg",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey").as("approx_parts"),
          approx_count_distinct($"l_suppkey", rsd = 0.01).as("approx_supps"),
          percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("p50"),
          percentile_approx($"l_extendedprice", lit(0.95), lit(1000)).as("p95"))
        .orderBy($"l_returnflag")
    },
    None)

  val all: Seq[QueryDef] = Seq(
    sketchAgg,
    scanProject, filterPred, filterJson,
    joinInner, joinBroadcast, joinLeft, joinSemi, joinAnti,
    q1Agg, aggDistinct, rollupAgg, cubeAgg, groupingSets,
    windowRank, windowRunning, windowMax, windowLag,
    topK, unionAll, intersectOp, exceptOp,
    fnString, fnDate, fnMath, fnArray, fnJson, fnRegexp,
    scalarSubquery, fnNull, pivotQ, explodePos)
}
