package graft

import graft.pipeline.HeavyHitters
import org.apache.spark.sql.functions._

/** Round-8 batch-3 specs: Misra–Gries theorem properties, the
  * changepoint statistic's known-answer behavior, and the MI profile's
  * independence zero. The DuckDB hash match (tools/check.py) covers
  * fixture equality; these pin the algorithmic guarantees the hash
  * can't see. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries candidates are a superset of true heavy hitters and ≤ k-1") {
    // adversarial-ish stream: geometric-ish skew + noise singletons,
    // shuffled deterministically across 7 partitions
    val rows = (1 to 4000).map { i =>
      if (i % 3 == 0) s"A" // 33%
      else if (i % 5 == 0) s"B" // ~13%
      else if (i % 7 == 0) s"C" // ~8.5%
      else s"noise_$i"
    }
    val df = spark.sparkContext.parallelize(scala.util.Random.javaRandomToRandom(
      new java.util.Random(42)).shuffle(rows), 7).toDF("k")
    for (k <- Seq(4, 8, 16)) {
      val cand = df.agg(HeavyHitters.candidates($"k", k)).as[Seq[String]]
        .head().toSet
      assert(cand.size <= k - 1, s"k=$k: more than k-1 candidates")
      val n = rows.size
      val exact = rows.groupBy(identity).view.mapValues(_.size)
        .filter { case (_, c) => c.toLong * k > n }.keySet
      assert(exact.subsetOf(cand),
        s"k=$k: true heavy hitters $exact not all in candidates $cand")
    }
  }

  test("heavy-hitter recount equals the exact groupBy-HAVING answer") {
    val q = SparkEntry.queries("q_sketch_heavyhit")(spark, sf)
      .as[(String, Long)].collect().toSeq
    val K = 16
    val keyed = Tables(spark, sf, "events").select(
      when($"event_id" % 4 === 0,
        concat(lit("hot_"), ($"event_id" % 3).cast("string")))
        .otherwise(concat(lit("cold_"), $"event_id".cast("string"))).as("k"))
    val n = keyed.count()
    val exact = keyed.groupBy($"k").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * K > n).orderBy($"cnt".desc, $"k")
      .as[(String, Long)].collect().toSeq
    assert(q == exact)
    assert(q.nonEmpty && q.forall(_._1.startsWith("hot_")),
      "planted hot keys are the heavy hitters")
  }

  test("changepoint statistic peaks at a planted level shift") {
    // 20 flat days at 10/day then 10 days at 30/day: the max-deviation
    // split must land at the boundary (day 20)
    val rows = (1 to 30).flatMap { day =>
      val cnt = if (day <= 20) 10 else 30
      (1 to cnt).map(i => (java.sql.Timestamp.valueOf(
        f"2024-02-$day%02d 12:00:00"), i))
    }
    rows.toDF("ts", "i").createOrReplaceTempView("events_cp")
    val out = spark.sql("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events_cp GROUP BY 1),
      seq AS (
        SELECT d, x, CAST(ROW_NUMBER() OVER (ORDER BY d) AS INT) AS t,
               CAST(SUM(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS DECIMAL(38,0)) AS st
        FROM daily),
      tot AS (SELECT CAST(SUM(x) AS DECIMAL(38,0)) AS sn,
                     CAST(COUNT(*) AS DECIMAL(38,0)) AS nd FROM daily)
      SELECT d, t, CAST(abs(nd * st - t * sn) AS DECIMAL(38,0)) AS dev
      FROM seq CROSS JOIN tot ORDER BY dev DESC, d LIMIT 1""")
    val top = out.select($"t").as[Int].head()
    assert(top == 20, s"max deviation should sit at the level shift, got t=$top")
  }

  test("MI term is zero for an independent pair and positive for a copy") {
    val df = (0 until 400).map(i => (i % 4, i % 5, i % 4)).toDF("a", "b", "c")
    df.createOrReplaceTempView("mi_t")
    def mi(x: String, y: String): Double = spark.sql(s"""
      WITH cells AS (SELECT $x AS u, $y AS v, COUNT(*) AS cxy FROM mi_t GROUP BY 1,2),
      rx AS (SELECT u, SUM(cxy) AS cx FROM cells GROUP BY 1),
      ry AS (SELECT v, SUM(cxy) AS cy FROM cells GROUP BY 1),
      tot AS (SELECT SUM(cxy) AS n FROM cells)
      SELECT SUM((CAST(cxy AS DOUBLE) / n) *
                 ln((CAST(cxy AS DOUBLE) * n) / (CAST(cx AS DOUBLE) * cy)))
      FROM cells JOIN rx USING (u) JOIN ry USING (v) CROSS JOIN tot""")
      .as[Double].head()
    assert(math.abs(mi("a", "b")) < 1e-12, "a ⫫ b by construction → MI 0")
    assert(math.abs(mi("a", "c") - math.log(4)) < 1e-12,
      "a == c → MI = H(a) = ln 4")
  }

  test("Benford audit digits cover 1..9 with exact total") {
    val out = SparkEntry.queries("q_quality_benford")(spark, sf)
      .select($"d1", $"obs").as[(Int, Long)].collect().toSeq
    assert(out.map(_._1) == (1 to 9),
      "all nine leading digits present, ordered")
    val n = Tables(spark, sf, "orders").count()
    assert(out.map(_._2).sum == n, "digit histogram partitions the orders")
  }
}
