package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pins the SGNS trainer's cross-engine float discipline
  * (graph/NodeEmbedding.scala) — every case here is a regression guard
  * for a divergence that actually shipped red in round 10.
  */
class NodeEmbeddingSpec extends SparkSpec {
  import spark.implicits._

  test("gradient multiply keeps scale 10 — the r10 silent-scale-7 bug") {
    // THE root cause of r10's q_graph_embeddings red: DECIMAL(20,10) ×
    // BIGINT promotes to precision 41 > 38 and Spark's
    // adjustPrecisionScale silently reduces the SCALE to 7, rounding
    // the 8th decimal of every gradient term away (DuckDB keeps scale
    // 10 → sums split by 1e-8·m → one weight off by one 6dp grid
    // point). The fix casts the multiplicity to DECIMAL(12,0)
    // (20+12+1 = 33 ≤ 38). This pins both the exact value and the
    // no-scale-loss schema.
    val df = Seq((0.00000003, 3L)).toDF("term", "m")
    val bad = df.select((col("term").cast(DecimalType(20, 10)) *
      col("m")).as("g"))
    val good = df.select((col("term").cast(DecimalType(20, 10)) *
      col("m").cast(DecimalType(12, 0))).as("g"))
    assert(bad.schema("g").dataType.asInstanceOf[DecimalType].scale == 7,
      "Spark changed decimal promotion — revisit the NodeEmbedding comment")
    assert(good.schema("g").dataType.asInstanceOf[DecimalType].scale == 10)
    assert(bad.head.getDecimal(0).doubleValue == 1e-7, "scale-7 rounds 9e-8 up")
    assert(good.head.getDecimal(0).doubleValue == 9e-8, "exact product")
  }

  test("pround boundary semantics: half-way rounds toward +inf, both signs") {
    // pround = floor(x·10^k + 0.5)/10^k — the engine-portable idiom
    // (floor/×/+/÷ are IEEE-correctly-rounded; no HALF_UP-vs-nearbyint
    // tie split). -0.0045815 was the actual r10 boundary case: ×1e6 =
    // -4581.5 exactly (the double is exact), +0.5 → -4581 → -0.004581.
    val df = Seq((-0.0045815, 0.0000025, 0.0000035)).toDF("a", "b", "c")
    val r = df.select(
      graft.graph.NodeEmbedding.pround(col("a"), 6).as("a6"),
      graft.graph.NodeEmbedding.pround(col("b"), 6).as("b6"),
      graft.graph.NodeEmbedding.pround(col("c"), 6).as("c6")).head
    assert(r.getDouble(0) == -0.004581, "half rounds toward +inf")
    // 2.5e-6·1e6 and 3.5e-6·1e6 land on/above the half after the IEEE
    // multiply: pround follows the DOUBLE's side of the boundary —
    // deterministically, on both engines, which is all the
    // cross-engine hash needs.
    assert(r.getDouble(1) == 3e-6 && r.getDouble(2) == 4e-6)
  }

  test("trained cell golden values at sf0.001 — the r10 diverging cell") {
    // (node=100031, dim=2) is the cell that was off by exactly 1e-6 in
    // r10 (and in the floor-idiom-only rewrite): its iteration-2
    // gradient sum -0.04123353 lost its trailing 3 to the scale-7
    // promotion, flooring the step on the wrong side of -4581.5e-6.
    // Golden values verified against the DuckDB oracle replay of all
    // three GD iterations (check.py green at sf0.001/0.01/0.1).
    val emb = SparkEntry.queries("q_graph_embeddings")(spark, sf)
      .where(($"node" === 100031 && $"dim" === 2) ||
        ($"node" === 6 && $"dim" === 0))
      .orderBy($"node").collect()
    assert(emb.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq ==
      Seq((6L, 0, 0.080044), (100031L, 2, 0.027032)))
  }

  test("training is a pure function of the graph — partition-layout-proof") {
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 101L), (2L, 103L),
      (3L, 102L), (3L, 103L), (4L, 101L), (4L, 104L))
      .toDF("src", "dst")
    val seeds = edges.select($"src".as("wid")).distinct()
    val nodes = edges.select($"src".as("n"))
      .union(edges.select($"dst".as("n"))).distinct()
    def train(part: Int) = {
      val e = edges.repartition(part)
      val w = graft.graph.Walks.deterministicWalks(e, seeds, steps = 3)
      graft.graph.NodeEmbedding.trainSgns(w, nodes, d = 2, iters = 2)
        .orderBy($"n", $"k").collect().toSeq
    }
    assert(train(1) == train(7))
  }

  test("vocabulary rank drops NULL nodes and is the sorted dense rank") {
    // sparseEdges can emit a NULL dst (try_cast of a non-numeric
    // props.k); Spark sorts NULLs first, DuckDB last — unfiltered,
    // every rank would shift and all hash-drawn negatives diverge.
    val nodes = Seq[java.lang.Long](5L, null, 1L, 9L, 3L).toDF("n")
    val (vr, nv) = graft.graph.NodeEmbedding.vocabRank(nodes)
    assert(vr.orderBy($"rk").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 0L), (3L, 1L), (5L, 2L), (9L, 3L)))
    assert(nv.head.getLong(0) == 4L)
  }
}
