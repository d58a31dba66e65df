package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Scale-path evidence: bucketing co-locates both sides of a fact⋈fact
  * join so the join runs with ZERO shuffle — the 100 TB answer when the
  * small side is too big to broadcast (SURVEY §2.B.3 / builder "bucketing
  * for co-located joins"). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    Tables(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(sum($"l_quantity").as("q"))

    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    // the join itself must be co-located; the only allowed shuffle is the
    // final single-column aggregation exchange
    assert(shuffles.size <= 1, s"expected ≤1 shuffle (agg only), got ${shuffles.size}")

    val rows = joined.collect()
    assert(rows.nonEmpty)
    val expected = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(sum($"l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getDouble(1) == expected(r.getString(0))))
  }
}
