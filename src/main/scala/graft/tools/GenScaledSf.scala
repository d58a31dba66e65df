package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger bench fixture by deterministic key-shifted
  * replication of an existing SF (default: sf0.1 × 10 → `benchdata/sf1`).
  *
  * /root/testdata is read-only and the driver's generator isn't available,
  * so this scales the EXISTING distribution: fact tables (and the TPC-H
  * linearly-scaling dims customer/supplier/part) get `copies` key-shifted
  * clones with referential integrity preserved (every FK shifts by the same
  * span as its PK); region/nation stay fixed. Documents get a per-copy
  * suffix (clones are near-dups, not byte dups — the realistic shape);
  * embeddings get a per-copy deterministic sign pattern (norms preserved,
  * directions spread — 10 exact copies would be a degenerate ANN corpus).
  * Purpose: Bench scaling runs ONLY (sf1 has no DuckDB-oracle role; keys <
  * 100000 stay clash-free with the planted-duplicate query offsets).
  */
object GenScaledSf {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "benchdata/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10

    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-gen-scaled-sf")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def span(t: String, c: String): Long =
      read(t).agg(max(col(c))).head().getLong(0) + 1
    def write(t: String, df: DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[gen-sf] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    /** Union of `copies` clones of `base`, clone i transformed by f(df, i). */
    def rep(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => f(base, i)).reduce(_ unionByName _)

    // fixed dimension tables
    Seq("region", "nation").foreach(t => write(t, read(t)))

    val custSpan = span("customer", "c_custkey")
    val suppSpan = span("supplier", "s_suppkey")
    val partSpan = span("part", "p_partkey")
    val orderSpan = span("orders", "o_orderkey")
    val eventSpan = span("events", "event_id")
    val userSpan = span("events", "user_id")
    val docSpan = span("documents", "doc_id")
    val vecSpan = span("embeddings", "vec_id")

    write("customer", rep(read("customer")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + i * custSpan) })
    write("supplier", rep(read("supplier")) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + i * suppSpan) })
    write("part", rep(read("part")) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + i * partSpan) })
    write("orders", rep(read("orders")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + i * orderSpan)
        .withColumn("o_custkey", col("o_custkey") + i * custSpan) })
    write("lineitem", rep(read("lineitem")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + i * orderSpan)
        .withColumn("l_partkey", col("l_partkey") + i * partSpan)
        .withColumn("l_suppkey", col("l_suppkey") + i * suppSpan) })
    write("events", rep(read("events")) { (df, i) =>
      df.withColumn("event_id", col("event_id") + i * eventSpan)
        .withColumn("user_id", col("user_id") + i * userSpan) })
    write("documents", rep(read("documents")) { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + i * docSpan)
        .withColumn("text",
          if (i == 0) col("text") else concat(col("text"), lit(s" c$i"))) })
    write("embeddings", rep(read("embeddings")) { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + i * vecSpan)
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"),
            (x, j) => when((j + lit(i * 7)) % 3 === 0, -x).otherwise(x))) })
    println(s"[gen-sf] wrote $dst (${copies}x $src)")
    spark.stop()
  }
}
