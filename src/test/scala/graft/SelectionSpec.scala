package graft

import graft.graph.Walks
import graft.pipeline.Selection
import graft.rel.ScaleQueries
import org.apache.spark.sql.functions._

/** DSIR importance weights + deterministic random walks. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables(spark, sf, "documents")

  test("dsir: target slice scores higher on average than the rest") {
    val w = Selection.dsirWeights(docs, "doc_id", "text",
      $"source".isin("src0", "src1"), buckets = 128)
      .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
    val Array(tgt, rest) = w
      .groupBy($"source".isin("src0", "src1").as("is_t"))
      .agg(avg($"weight").as("a"))
      .orderBy($"is_t".desc).as[(Boolean, Double)].collect()
    assert(tgt._1 && !rest._1)
    assert(tgt._2 > rest._2,
      s"target mean weight ${tgt._2} should exceed non-target ${rest._2}")
  }

  test("dsir: weights are repartition-independent (exact decimal sums)") {
    val base = Selection.dsirWeights(docs, "doc_id", "text",
      $"source" === "src0", buckets = 64)
    val shuffled = Selection.dsirWeights(docs.repartition(17), "doc_id", "text",
      $"source" === "src0", buckets = 64)
    assert(base.orderBy($"doc_id").collect().toSeq ==
      shuffled.orderBy($"doc_id").collect().toSeq)
  }

  test("walks: every step follows an actual edge and is hash-reproducible") {
    val edges = ScaleQueries.sparseEdges(spark, sf)
    val seeds = edges.select($"src".as("wid")).distinct().orderBy($"wid").limit(5)
    val run1 = Walks.deterministicWalks(edges, seeds, steps = 3)
      .orderBy($"wid", $"step").collect()
    val run2 = Walks.deterministicWalks(edges, seeds, steps = 3)
      .orderBy($"wid", $"step").collect()
    assert(run1.toSeq == run2.toSeq, "walks must be deterministic")
    assert(run1.length == 5 * 4, "connected bipartite walks never die")

    // each consecutive (node_t, node_t+1) must be an undirected edge
    val und = edges.select($"src", $"dst")
      .union(edges.select($"dst", $"src"))
      .as[(Long, Long)].collect().toSet
    val byWalker = run1.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).values
    byWalker.foreach { steps =>
      steps.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, a), (_, _, b)) =>
          assert(und.contains((a, b)), s"($a,$b) is not an edge")
        case _ =>
      }
    }
  }

  test("walks: choice matches the documented hash rule on a hand graph") {
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("wid")
    val step1 = Walks.deterministicWalks(edges, seeds, steps = 1)
      .filter($"step" === 1).as[(Long, Int, Long)].collect().head
    // replay the rule by hand: rank of chosen neighbor among {10,11,12}
    val h = Tables(spark, sf, "documents").sparkSession.range(1)
      .select(graft.pipeline.TextOps.strHash(lit("1:1:1")).as("h"))
      .as[Long].collect().head
    val expected = Seq(10L, 11L, 12L)((h % 3).toInt)
    assert(step1._3 == expected)
  }

  test("node2vec: unit weights reduce exactly to the first-order walk") {
    // with wRet = wTri = wOut = 1 the cumulative ranges are the ranks and
    // the draw string is identical, so the biased walk IS deterministicWalks
    val edges = ScaleQueries.sparseEdges(spark, sf)
    val seeds = edges.select($"src".as("wid")).distinct().orderBy($"wid").limit(5)
    val uni = Walks.node2vecWalks(edges, seeds, steps = 3,
        wRet = 1, wTri = 1, wOut = 1)
      .orderBy($"wid", $"step").collect().toSeq
    val first = Walks.deterministicWalks(edges, seeds, steps = 3)
      .orderBy($"wid", $"step").collect().toSeq
    assert(uni == first, "uniform node2vec must equal the first-order walk")
  }

  test("node2vec: leaves force return; dominant triangle weight avoids backtracking") {
    // path 1-2: every step alternates (the only neighbor is prev)
    val path = Seq((1L, 2L)).toDF("src", "dst")
    val p = Walks.node2vecWalks(path, Seq(1L).toDF("wid"), steps = 4)
      .orderBy($"step").as[(Long, Int, Long)].collect().map(_._3).toSeq
    assert(p == Seq(1L, 2L, 1L, 2L, 1L), s"leaf walk must alternate: $p")

    // K3 with wTri >> wRet: after step 1 the walker must never immediately
    // backtrack (the return candidate's range is 1 of 2^20+1 slots; the
    // hash draws on this fixed graph are deterministic and land tri-side)
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val t = Walks.node2vecWalks(k3, Seq(1L).toDF("wid"), steps = 6,
        wRet = 1, wTri = 1 << 20, wOut = 1)
      .orderBy($"step").as[(Long, Int, Long)].collect().map(_._3).toSeq
    t.sliding(3).foreach { w =>
      assert(w.head != w.last,
        s"dominant triangle weight must not backtrack: $t")
    }
    // determinism across partitioning (windows are per-walker, hash-driven)
    val t2 = Walks.node2vecWalks(k3.repartition(5), Seq(1L).toDF("wid"),
        steps = 6, wRet = 1, wTri = 1 << 20, wOut = 1)
      .orderBy($"step").as[(Long, Int, Long)].collect().map(_._3).toSeq
    assert(t == t2, "node2vec walk must be partition-independent")
  }
}
