package graft

import graft.plans.{Skyline, SkylineExec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The Pareto-skyline custom operator (graft.plans.Skyline): a custom
  * LogicalPlan + SparkStrategy + SparkPlan. Correctness oracle here is the
  * quadratic NOT EXISTS dominance self-join; the declared q_skyline query
  * carries the same check against DuckDB. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame,
                    minCols: Seq[String], maxCols: Seq[String]): Set[Row] = {
    df.createOrReplaceTempView("sky_in")
    val conds = minCols.map(c => (s"s.$c <= r.$c", s"s.$c < r.$c")) ++
      maxCols.map(c => (s"s.$c >= r.$c", s"s.$c > r.$c"))
    val weak = conds.map(_._1).mkString(" AND ")
    val strict = conds.map(_._2).mkString(" OR ")
    spark.sql(
      s"""SELECT r.* FROM sky_in r WHERE NOT EXISTS (
         |  SELECT 1 FROM sky_in s WHERE $weak AND ($strict))""".stripMargin)
      .collect().toSet
  }

  test("skyline == NOT EXISTS dominance self-join on the part fixture") {
    val part = Tables(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size")
    val got = Skyline.of(part, Seq("p_retailprice"), Seq("p_size"))
      .collect().toSet
    val want = naive(part, Seq("p_retailprice"), Seq("p_size"))
    assert(got == want)
    assert(got.nonEmpty && got.size < part.count(),
      "skyline must filter but not be vacuous")
  }

  test("3-dim skyline with known answer; incomparable ties all kept") {
    // 1/2/3 mutually incomparable (each trades a win for a loss);
    // 4 = (1.0,1,1) dominated by 2 = (1.0,2,1); 5 duplicates 1 exactly —
    // equal points never strictly win, so both copies are kept.
    val df = Seq(
      (1, 0.0, 1, 1), (2, 1.0, 2, 1), (3, 1.0, 1, 2),
      (4, 1.0, 1, 1), (5, 0.0, 1, 1))
      .toDF("id", "m", "a", "b")
    val got = Skyline.of(df, Seq("m"), Seq("a", "b"))
      .select("id").as[Int].collect().toSet
    assert(got == Set(1, 2, 3, 5))
  }

  test("result is partitioning-invariant and null dims are excluded") {
    val base = Seq(
      (1, Some(1.0), Some(10)), (2, Some(2.0), Some(20)),
      (3, Some(0.5), Some(5)), (4, None, Some(99)), (5, Some(0.1), None))
      .toDF("id", "price", "score")
    val one = Skyline.of(base.repartition(1), Seq("price"), Seq("score"))
      .select("id").as[Int].collect().toSet
    val many = Skyline.of(base.repartition(7), Seq("price"), Seq("score"))
      .select("id").as[Int].collect().toSet
    assert(one == many)
    // rows 4/5 (null dim) excluded; 1,2,3 mutually incomparable on
    // (min price, max score): each trades price against score
    assert(one == Set(1, 2, 3))
  }

  test("plans through SkylineExec (the custom physical operator)") {
    val part = Tables(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size")
    val plan = Skyline.of(part, Seq("p_retailprice"), Seq("p_size"))
      .queryExecution.sparkPlan // pre-AQE: the adaptive root is opaque
    assert(plan.collectFirst { case e: SkylineExec => e }.isDefined,
      s"expected SkylineExec in:\n$plan")
  }

  test("local-phase pruning: merge input is bounded by per-partition skylines") {
    // Heavily dominated input: each partition's local skyline keeps only
    // its min-cost rows, so the merge phase sees a small candidate set no
    // matter the input size; the final result is every cost-0 row (all
    // equal ⇒ incomparable ⇒ all kept).
    val n = 10000
    val df = spark.range(n).select(
      $"id", ($"id" % 97).cast("double").as("cost"), lit(1).as("gain"))
    val got = Skyline.of(df.repartition(8), Seq("cost"), Seq("gain"))
    // global skyline = all rows with cost 0 (ties, incomparable equals)
    assert(got.count() == (n + 96) / 97)
    assert(got.select("cost").distinct().as[Double].collect().toSeq == Seq(0.0))
  }
}
