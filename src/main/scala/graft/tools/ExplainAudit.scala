package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Prints formatted physical plans for representative queries so plan
  * regressions (lost pushdown, wrong join strategy, broken codegen) are
  * visible. `sbt "runMain graft.tools.ExplainAudit [query...]"`;
  * SPARK_GRAFT_SF_DIR overrides the fixture dir (plans can flip with
  * data size — e.g. a broadcast side outgrowing the threshold at sf1). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter_pred", "q_join_broadcast", "q_topk", "q_vec_topk",
        "q1_agg", "q_join_asof", "q_join_range", "q_ann_ivf", "q_ann_pq",
        "q_stats_moments", "q_graph_triangles", "q_dedup_embcos_lsh",
        "q_text_decontam", "q_text_pack")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
