package graft.tools

import java.nio.charset.StandardCharsets

import graft.Tables
import graft.functions.HashEmbed
import graft.pipeline.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Regenerates the committed golden fixtures under `fixtures/`.
  *
  * `hash_embed_golden.parquet`: (token, bucket) for every distinct token in
  * the documents fixtures at all SFs, where bucket is the Murmur3(seed 42)
  * hash bucket at dim=64 — the embedding spec of [[HashEmbed]]
  * (reference app.py:368-377). The DuckDB oracle of q_hash_embed joins this
  * table to reconstruct per-doc nnz independently of the Scala kernel: if
  * the kernel's hashing ever drifts from the committed mapping (or the
  * mapping goes stale against new fixture vocabulary), the hash-compare
  * fails. The mapping itself is pinned against hand-derived golden vectors
  * in VectorFunctionsSpec.
  */
object GenGoldenFixtures {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-gen-fixtures")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // covers the driver fixtures AND the Spark-written sf1 bench fixture
    // (its clone suffixes introduce vocabulary the driver SFs lack — the
    // r13 full-sf1 sweep caught the stale-mapping nnz deflation exactly
    // as this fixture's inner-join contract intends)
    // sf1 lives under the REPO ROOT, not the cwd: run from anywhere else,
    // a cwd-relative path would silently regenerate the fixture WITHOUT
    // the sf1 clone-marker vocabulary — the exact stale-fixture nnz
    // deflation the sf1 coverage exists to prevent. Resolve against
    // SPARK_GRAFT_REPO (default /root/repo) and be LOUD when skipping.
    val repoRoot = sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")
    val sf1 = s"$repoRoot/benchdata/sf1"
    val sf1Present = new java.io.File(s"$sf1/documents.parquet").exists
    if (!sf1Present)
      System.err.println(s"[gen-golden] WARNING: $sf1 absent — golden " +
        "token fixture will NOT cover the sf1 clone-marker vocabulary")
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1") ++ (if (sf1Present) Seq(sf1) else Nil)
    val tokens = dirs
      .map(sf => Tables(spark, sf, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token")))
      .reduce(_ unionByName _)
      .distinct().as[String].collect().sorted
    val dim = 64
    val rows = tokens.toSeq.map { t =>
      val h = MurmurHash3.bytesHash(t.getBytes(StandardCharsets.UTF_8), HashEmbed.Seed)
      (t, ((h % dim) + dim) % dim)
    }
    rows.toDF("token", "bucket").coalesce(1)
      .write.mode("overwrite").parquet("fixtures/hash_embed_golden.parquet")
    println(s"wrote fixtures/hash_embed_golden.parquet: ${rows.size} tokens")
  }
}
