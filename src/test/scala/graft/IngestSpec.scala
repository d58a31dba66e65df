package graft

import graft.api.Engine
import graft.model.Node
import graft.store.TableCatalog
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming mutation ingestion: node rows streamed into the live catalog,
  * visible to engine searches after each micro-batch; last-write-wins. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("streamed node mutations upsert into the catalog (last-write-wins)") {
    implicit val sql = spark.sqlContext
    val catalog = new TableCatalog(spark)
    val engine = new Engine(catalog)
    val stream = MemoryStream[Node]
    val q = EventStreams.ingestNodes(stream.toDS(), catalog)
    try {
      stream.addData(
        Node("n1", "first version", Map("v" -> "1"), "t0", "t0"),
        Node("n2", "other node", Map.empty, "t0", "t0"))
      q.processAllAvailable()
      assert(engine.getNode("n1").get.text == "first version")
      assert(engine.stats().totalNodes == 2)

      stream.addData(Node("n1", "second version", Map("v" -> "2"), "t0", "t1"))
      q.processAllAvailable()
      val n1 = engine.getNode("n1").get
      assert(n1.text == "second version", "upsert replaces, not duplicates")
      assert(n1.metadata == Map("v" -> "2"))
      assert(engine.stats().totalNodes == 2)
    } finally q.stop()
  }
}
