package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew handling: two-phase salted aggregation produces exactly the same
  * result as the direct groupBy (DECIMAL-exact), while bounding the rows
  * any single reducer sees for a hot key — the manual pattern behind
  * AQE's skew mitigation, usable where AQE can't help (e.g. groupBy).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation == direct aggregation, exactly") {
    // manufacture skew: fold most users into one hot key
    val e = Tables(spark, sf, "events")
      .withColumn("key", when($"user_id" < 12, lit(0L)).otherwise($"user_id"))
      .withColumn("v", $"value".cast(DecimalType(18, 2)))

    val direct = e.groupBy($"key")
      .agg(sum($"v").cast("double").as("total"), count(lit(1)).as("n"))
      .as[(Long, Double, Long)].collect().map { case (k, v, n) => k -> (v, n) }.toMap

    val salted = e
      .withColumn("salt", pmod(xxhash64($"event_id"), lit(16)))
      .groupBy($"key", $"salt")
      .agg(sum($"v").as("pv"), count(lit(1)).as("pn")) // phase 1: 16-way fan-out
      .groupBy($"key")
      .agg(sum($"pv").cast("double").as("total"), sum($"pn").as("n")) // phase 2
      .as[(Long, Double, Long)].collect().map { case (k, v, n) => k -> (v, n) }.toMap

    assert(salted == direct, "DECIMAL sums make the two-phase result exact")
    assert(direct(0L)._2 > direct.filterKeys(_ != 0L).values.map(_._2).max * 5,
      "key 0 really is skewed in this fixture")
  }
}
