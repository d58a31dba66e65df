package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Scans every declared query's physical plan for scale red flags:
  * CartesianProduct and non-broadcast nested-loop joins. Exits nonzero if
  * any query plans a true cartesian — the cheap tripwire the plan audit
  * runs per round. */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cart) { bad += 1; println(s"[planscan] CARTESIAN in $name") }
        else if (bnlj) println(s"[planscan] note: broadcast NL join in $name (ok if one side is tiny)")
      } catch { case e: Throwable =>
        bad += 1; println(s"[planscan] $name failed to plan: ${e.getMessage}")
      }
    }
    println(s"[planscan] done, $bad hard failures")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
