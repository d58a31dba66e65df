package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.model._

import scala.jdk.CollectionConverters._

/** Minimal JDK HTTP shell over [[Engine]], speaking the reference's JSON
  * contracts verbatim (app.py:753-948) so `test_final.py` runs against it
  * unmodified. Serialization goes through jackson over plain Java
  * collections (correct escaping, no new dependencies — jackson ships with
  * Spark). One request at a time (single-thread executor): the engine's
  * snapshot store is single-writer by design and the reference's test
  * harness is sequential.
  */
final class EngineHttpServer(engine: Engine, port: Int) {
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  // ------------------------------------------------------------- JSON out
  /** Scala value → jackson-serializable Java structure. */
  private def j(v: Any): Object = v match {
    case null          => null
    case Some(x)       => j(x)
    case None          => null
    case m: Map[_, _]  =>
      val out = new java.util.LinkedHashMap[String, Object]()
      m.foreach { case (k, x) => out.put(k.toString, j(x)) }
      out
    case s: Seq[_]     =>
      val out = new java.util.ArrayList[Object](s.length)
      s.foreach(x => out.add(j(x)))
      out
    case f: Float      => java.lang.Double.valueOf(f.toDouble)
    case other         => other.asInstanceOf[Object]
  }

  private def nodeJson(n: NodeDetails, withEmbedding: Boolean): Map[String, Any] = {
    val base = Map(
      "id" -> n.id, "text" -> n.text, "metadata" -> n.metadata,
      "created_at" -> n.created_at, "updated_at" -> n.updated_at,
      "has_embedding" -> n.hasEmbedding,
      "edges" -> Map(
        "outgoing" -> n.outgoing.map(e => Map(
          "id" -> e.id, "target_id" -> e.target, "type" -> e.etype,
          "weight" -> e.weight)),
        "incoming" -> n.incoming.map(e => Map(
          "id" -> e.id, "source_id" -> e.source, "type" -> e.etype,
          "weight" -> e.weight))))
    // reference: GET omits the raw vector, POST/PUT echo it (app.py:777-781)
    if (withEmbedding) base ++ n.embedding.map(v => "embedding" -> v)
    else base
  }

  private def edgeJson(e: EdgeInfo): Map[String, Any] = Map(
    "id" -> e.id, "source" -> e.source, "target" -> e.target,
    "type" -> e.etype, "weight" -> e.weight)

  // -------------------------------------------------------------- JSON in
  private def parseBody(ex: HttpExchange): Map[String, Object] = {
    val raw = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    if (raw.isEmpty) Map.empty
    else mapper.readValue(raw, classOf[java.util.Map[String, Object]])
      .asScala.toMap
  }

  private def optStr(b: Map[String, Object], k: String): Option[String] =
    b.get(k).filter(_ != null).map(_.toString)

  private def optStrMap(b: Map[String, Object], k: String): Option[Map[String, String]] =
    b.get(k).filter(_ != null).map {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (kk, vv) => kk.toString -> String.valueOf(vv) }.toMap
    }

  private def optVec(b: Map[String, Object], k: String): Option[Seq[Float]] =
    b.get(k).filter(_ != null).map {
      case l: java.util.List[_] =>
        l.asScala.map(_.asInstanceOf[Number].floatValue()).toSeq
    }

  private def optBool(b: Map[String, Object], k: String, dflt: Boolean): Boolean =
    b.get(k).filter(_ != null).map(_.asInstanceOf[Boolean].booleanValue())
      .getOrElse(dflt)

  private def optNum(b: Map[String, Object], k: String): Option[Double] =
    b.get(k).filter(_ != null).map(_.asInstanceOf[Number].doubleValue())

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  // ------------------------------------------------------------ responses
  private def respond(ex: HttpExchange, code: Int, body: Any): Unit = {
    val bytes = mapper.writeValueAsString(j(body)).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def noContent(ex: HttpExchange): Unit = {
    ex.sendResponseHeaders(204, -1)
    ex.close()
  }

  private def notFound(ex: HttpExchange, detail: String): Unit =
    respond(ex, 404, Map("detail" -> detail))

  private def handler(f: HttpExchange => Unit): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) =>
      try f(ex)
      catch {
        case e: Throwable =>
          try respond(ex, 500, Map("detail" -> String.valueOf(e))) catch { case _: Throwable => () }
      }

  // --------------------------------------------------------------- routes
  private def pathTail(ex: HttpExchange, prefix: String): Option[String] = {
    val p = ex.getRequestURI.getPath
    if (p.length > prefix.length + 1 && p.startsWith(prefix + "/"))
      Some(p.substring(prefix.length + 1)) else None
  }

  server.createContext("/nodes", handler { ex =>
    (ex.getRequestMethod, pathTail(ex, "/nodes")) match {
      case ("POST", None) =>
        val b = parseBody(ex)
        val n = engine.createNode(
          text = optStr(b, "text").getOrElse(""),
          metadata = optStrMap(b, "metadata").getOrElse(Map.empty),
          autoEmbed = optBool(b, "auto_embed", dflt = true),
          embedding = optVec(b, "embedding"))
        respond(ex, 201, nodeJson(n, withEmbedding = true))
      case ("GET", Some(id)) =>
        engine.getNode(id) match {
          case Some(n) => respond(ex, 200, nodeJson(n, withEmbedding = false))
          case None    => notFound(ex, "Node not found")
        }
      case ("PUT", Some(id)) =>
        val b = parseBody(ex)
        engine.updateNode(id,
          text = optStr(b, "text"),
          metadata = optStrMap(b, "metadata"),
          regenEmbedding = optBool(b, "regen_embedding", dflt = false),
          embedding = optVec(b, "embedding")) match {
          case Some(n) => respond(ex, 200, nodeJson(n, withEmbedding = true))
          case None    => notFound(ex, "Node not found")
        }
      case ("DELETE", Some(id)) =>
        if (engine.deleteNode(id)) noContent(ex)
        else notFound(ex, "Node not found")
      case _ => notFound(ex, "Not found")
    }
  })

  server.createContext("/edges", handler { ex =>
    (ex.getRequestMethod, pathTail(ex, "/edges")) match {
      case ("POST", None) =>
        val b = parseBody(ex)
        val source = optStr(b, "source").getOrElse("")
        val target = optStr(b, "target").getOrElse("")
        engine.createEdge(source, target,
          etype = optStr(b, "type").getOrElse("default"),
          weight = optNum(b, "weight").getOrElse(1.0)) match {
          case Some(e) => respond(ex, 201, edgeJson(e))
          case None    => notFound(ex, s"Source node $source not found")
        }
      case ("GET", Some(id)) =>
        engine.getEdge(id) match {
          case Some(e) => respond(ex, 200, edgeJson(e))
          case None    => notFound(ex, "Edge not found")
        }
      case ("PUT", Some(id)) =>
        val b = parseBody(ex)
        engine.updateEdge(id, etype = optStr(b, "type"),
          weight = optNum(b, "weight")) match {
          case Some(e) => respond(ex, 200, edgeJson(e))
          case None    => notFound(ex, "Edge not found")
        }
      case ("DELETE", Some(id)) =>
        if (engine.deleteEdge(id)) noContent(ex)
        else notFound(ex, "Edge not found")
      case _ => notFound(ex, "Not found")
    }
  })

  server.createContext("/search/vector", handler { ex =>
    val b = parseBody(ex)
    val hits = engine.vectorSearch(
      queryText = optStr(b, "query_text").getOrElse(""),
      topK = optNum(b, "top_k").map(_.toInt).getOrElse(10),
      metadataFilter = optStrMap(b, "metadata_filter").getOrElse(Map.empty))
    respond(ex, 200, hits.map(h => Map(
      "node" -> Map("id" -> h.id, "text" -> h.text, "metadata" -> h.metadata),
      "vector_score" -> h.vectorScore)))
  })

  server.createContext("/search/graph", handler { ex =>
    val q = queryParams(ex)
    val startId = q.getOrElse("start_id", "")
    engine.graphSearch(startId,
      depth = q.get("depth").map(_.toInt).getOrElse(2),
      edgeType = q.get("type")) match {
      case Some(r) => respond(ex, 200, Map(
        "start_id" -> r.startId, "depth" -> r.depth, "edge_type" -> r.edgeType,
        "nodes" -> r.nodes.map(n => Map(
          "node" -> Map("id" -> n.id, "text" -> n.text, "metadata" -> n.metadata),
          "distance" -> n.distance, "path_weight" -> n.pathWeight)),
        "edges" -> r.edges.map(edgeJson)))
      case None => notFound(ex, "Start node not found")
    }
  })

  server.createContext("/search/hybrid", handler { ex =>
    val b = parseBody(ex)
    engine.hybridSearch(
      queryText = optStr(b, "query_text").getOrElse(""),
      vectorWeight = optNum(b, "vector_weight").getOrElse(0.5),
      graphWeight = optNum(b, "graph_weight").getOrElse(0.5),
      topK = optNum(b, "top_k").map(_.toInt).getOrElse(10),
      graphStartId = optStr(b, "graph_start_id"),
      graphDepth = optNum(b, "graph_depth").map(_.toInt).getOrElse(2)) match {
      case Some(hits) => respond(ex, 200, hits.map(h => Map(
        "node" -> Map("id" -> h.id, "text" -> h.text),
        "vector_score" -> h.vectorScore,
        "graph_score" -> h.graphScore,
        "final_score" -> h.finalScore)))
      case None => notFound(ex, "Graph start node not found")
    }
  })

  server.createContext("/stats", handler { ex =>
    val s = engine.stats()
    respond(ex, 200, Map(
      "total_nodes" -> s.totalNodes,
      "nodes_with_embeddings" -> s.nodesWithEmbeddings,
      "total_edges" -> s.totalEdges))
  })

  server.createContext("/", handler { ex =>
    if (ex.getRequestURI.getPath == "/")
      respond(ex, 200, Map("status" -> "Vector + Graph Database is running"))
    else notFound(ex, "Not found")
  })

  server.setExecutor(Executors.newSingleThreadExecutor())

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort
}

/** `runMain graft.api.ServeMain [port]` — stand up the engine over an empty
  * store and serve the reference HTTP contract (reference runner:
  * test_final.py:801-841 against http://127.0.0.1:8000). */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.orElse(sys.env.get("APP_PORT")).map(_.toInt)
      .getOrElse(8000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-serve")
      // point-lookup workload over driver-local snapshots: big shuffle
      // fan-out only adds scheduling latency per request
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new EngineHttpServer(new Engine(spark), port)
    srv.start()
    println(s"graft engine serving on http://127.0.0.1:$port")
    Thread.currentThread.join()
  }
}
