package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the q_graph_embeddings cross-engine diff. */
object DebugEmb {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = graft.rel.ScaleQueries.sparseEdges(spark, dir)
    val seeds = edges.select($"src".as("wid")).distinct().orderBy($"wid").limit(10)
    val walks = graft.graph.Walks.deterministicWalks(edges, seeds, steps = 4)
    val nodes = edges.select($"src".as("n"))
      .union(edges.select($"dst".as("n"))).distinct()
    import graft.graph.NodeEmbedding
    val (vr, nvDf) = NodeEmbedding.vocabRank(nodes)
    val rows = NodeEmbedding.pairGroups(walks, vr, nvDf, 2, 2)
    var u = NodeEmbedding.initIn(vr, 4).localCheckpoint()
    var c = u.select($"n", $"k", lit(0.0).as("val")).localCheckpoint()
    val (u1, c1) = NodeEmbedding.step(rows, u, c, 1.0)
    // recompute e2 inline (same expressions as step) for ctr = 6
    import org.apache.spark.sql.types.DecimalType
    def dec(x: org.apache.spark.sql.Column) = x.cast(DecimalType(20, 10))
    val e2 = rows
      .join(u1.select($"n".as("ctr"), $"k", $"val".as("uv")), "ctr")
      .join(c1.select($"n".as("ctx"), $"k", $"val".as("cv")), Seq("ctx", "k"))
      .groupBy($"ctr", $"ctx", $"y", $"m")
      .agg(round(sum(dec(round($"uv" * $"cv", 8))).cast("double"), 8).as("z"))
      .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-$"z")), 8))
      .filter($"ctr" === 6)
      .orderBy($"ctx", $"y")
    e2.collect().foreach { r =>
      println(s"[debugemb] ctx=${r.get(1)} y=${r.get(2)} z=${r.getDouble(4)} " +
        s"zhex=${java.lang.Double.toHexString(r.getDouble(4))} p=${r.getDouble(5)}")
    }
    spark.stop()
  }
}
