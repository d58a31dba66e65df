package graft

import graft.api.Engine
import graft.store.TableCatalog

/** Snapshot-store durability: save → fresh catalog → load → identical
  * engine-visible state (the parquet form IS the store's durable form). */
class StoreSpec extends SparkSpec {

  test("catalog parquet round-trip preserves nodes, embeddings, edges") {
    val e1 = new Engine(new TableCatalog(spark))
    val a = e1.createNode("persisted node A", Map("k" -> "v"))
    val b = e1.createNode("persisted node B", autoEmbed = false)
    e1.createEdge(a.id, b.id, "durable", 2.5)

    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    e1.catalog.save(dir)

    val c2 = new TableCatalog(spark)
    c2.load(
      spark.read.parquet(s"$dir/nodes.parquet"),
      spark.read.parquet(s"$dir/embeddings.parquet"),
      spark.read.parquet(s"$dir/edges.parquet"))
    val e2 = new Engine(c2)

    assert(e2.stats() == e1.stats())
    val got = e2.getNode(a.id).get
    assert(got.text == "persisted node A")
    assert(got.metadata == Map("k" -> "v"))
    assert(got.hasEmbedding && got.embedding.get == a.embedding.get)
    assert(got.outgoing.exists(x => x.target == b.id && x.weight == 2.5))
    // mutations on the restored catalog keep working
    assert(e2.deleteNode(b.id))
    assert(e2.getNode(b.id).isEmpty)
    assert(e1.getNode(b.id).nonEmpty, "snapshot isolation between catalogs")
  }
}
