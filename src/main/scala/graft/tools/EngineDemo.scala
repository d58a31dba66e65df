package graft.tools

import graft.api.Engine
import graft.store.TableCatalog
import org.apache.spark.sql.SparkSession

/** Usage example / smoke driver for the engine facade: exercises the full
  * reference API surface (CRUD → vector → graph → hybrid → stats) end-to-end
  * and prints each response. `sbt "runMain graft.tools.EngineDemo"`. */
object EngineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-engine-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val engine = new Engine(new TableCatalog(spark))

    println(s"health: ${engine.health()}")
    println(s"empty-store searches: vector=${engine.vectorSearch("x").size} " +
      s"bm25=${engine.bm25Search("x").size} hybrid=${engine.hybridSearch("x").get.size}")

    val a = engine.createNode("Convolutional neural networks for image classification",
      Map("type" -> "paper"))
    val b = engine.createNode("Deep learning for speech and audio processing",
      Map("type" -> "paper"))
    val c = engine.createNode("Gardening tips for spring vegetables",
      Map("type" -> "note"))
    println(s"created: ${Seq(a, b, c).map(_.id).mkString(", ")}")

    val e = engine.createEdge(a.id, b.id, "cites", 2.0).get
    println(s"edge: ${e.id} ${e.source} -> ${e.target} (${e.etype}, ${e.weight})")
    println(s"node A outgoing: ${engine.getNode(a.id).get.outgoing}")

    val vhits = engine.vectorSearch("neural networks image classification", topK = 3)
    println("vector search:")
    vhits.foreach(h => println(f"  ${h.vectorScore}%.4f ${h.text}"))

    val filtered = engine.vectorSearch("anything", topK = 10,
      metadataFilter = Map("type" -> "note"))
    println(s"metadata-filtered: ${filtered.map(_.text)}")

    val khits = engine.bm25Search("deep learning")
    println(s"bm25: $khits")

    val g = engine.graphSearch(a.id, depth = 2).get
    println(s"graph from A: nodes=${g.nodes.map(n => (n.id.take(13), n.distance, n.pathWeight))} edges=${g.edges.size}")

    val h = engine.hybridSearch("neural networks image classification",
      graphStartId = Some(a.id)).get
    println("hybrid:")
    h.foreach(x => println(f"  final=${x.finalScore}%.4f vec=${x.vectorScore}%.4f graph=${x.graphScore}%.4f ${x.text.take(40)}"))

    // streaming mutation ingestion: node rows arriving as a stream
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.model.Node
      import spark.implicits._
      implicit val sql = spark.sqlContext
      val stream = MemoryStream[Node]
      val q = graft.streaming.EventStreams.ingestNodes(stream.toDS(), engine.catalog)
      stream.addData(Node("streamed-1", "node that arrived via stream", Map("src" -> "stream"), "t", "t"))
      q.processAllAvailable(); q.stop()
      println(s"streamed node visible: ${engine.getNode("streamed-1").map(_.text)}")
    }

    println(s"connected components: ${engine.connectedComponents()}")

    engine.updateEdge(e.id, weight = Some(5.0))
    println(s"updated edge weight: ${engine.getEdge(e.id).get.weight}")
    engine.deleteNode(b.id)
    println(s"after cascade delete of B: edge=${engine.getEdge(e.id)}, stats=${engine.stats()}")

    spark.stop()
  }
}
