package graft.api

import java.time.Instant
import java.util.UUID

import graft.functions.{vec, HashEmbed}
import graft.graph.{Bfs, GraphOps}
import graft.hybrid.HybridSearch
import graft.model._
import graft.search.Bm25
import graft.store.TableCatalog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Opt-in serving mode for [[Engine.vectorSearch]].
  *
  * [[AnnMode.BruteForce]] is the reference contract (app.py:394-444,
  * full-scan exact top-k) and the default — its results are bit-identical
  * to the reference and must never change. The approximate modes make the
  * engine's trained-index serving paths (the ones the declared q_ann_*
  * queries exercise) reachable through the same facade: they generate a
  * candidate set from the index, then score the SURVIVORS with the exact
  * reference scoring (dot product + dim filter + metadata post-filter), so
  * an approximate hit always carries the same `vectorScore` the reference
  * would report for it. */
sealed trait AnnMode
object AnnMode {
  /** Reference-faithful exact full scan (the default). */
  case object BruteForce extends AnnMode
  /** Trained k-means coarse quantizer (session-cached, invalidated by the
    * embeddings snapshot version): probe the `nprobe` cells nearest the
    * query, exact-score only their members. */
  final case class TrainedIvf(nprobe: Int = 2) extends AnnMode
  /** SQ8 int8 scalar quantization: integer-dot scan over 8-bit codes,
    * exact rerank of the `rerank` best candidates. */
  final case class Sq8(rerank: Int = 64) extends AnnMode
}

/** The engine facade — the reference's full 14-endpoint capability surface
  * (SURVEY §2.A O21-O23, app.py:753-940) as plain Scala methods over Spark
  * plans. HTTP status contracts map to Option/Boolean returns (404 → None).
  */
final class Engine(val catalog: TableCatalog, val dim: Int = HashEmbed.DefaultDim) {
  private val spark = catalog.spark
  import spark.implicits._

  private def now(): String = Instant.now().toString
  private def newId(prefix: String): String = s"$prefix-${UUID.randomUUID()}"

  def this(spark: org.apache.spark.sql.SparkSession) = this(new TableCatalog(spark))

  // ------------------------------------------------------------ node CRUD
  /** POST /nodes (O21, app.py:753-782). Embedding precedence: explicit >
    * auto_embed > none (app.py:761-769). */
  def createNode(text: String, metadata: Map[String, String] = Map.empty,
                 autoEmbed: Boolean = true,
                 embedding: Option[Seq[Float]] = None): NodeDetails = {
    val id = newId("node")
    val ts = now()
    catalog.upsertNode(Node(id, text, metadata, ts, ts))
    val emb = embedding.orElse(
      if (autoEmbed) Some(HashEmbed.encode(text, dim).toSeq) else None)
    emb.foreach(v => catalog.upsertEmbedding(EmbeddingRow(id, v, v.length)))
    getNode(id).get
  }

  /** GET /nodes/{id} (O3, app.py:163-202): details + has_embedding +
    * outgoing/incoming edges. */
  def getNode(id: String): Option[NodeDetails] = {
    val n = catalog.nodes.filter($"id" === id).as[Node].collect().headOption
    n.map { node =>
      val emb = catalog.embeddings.filter($"node_id" === id)
        .as[EmbeddingRow].collect().headOption
      val out = edgeInfos(catalog.edges.filter($"source" === id))
      val in = edgeInfos(catalog.edges.filter($"target" === id))
      NodeDetails(node.id, node.text, node.metadata, node.created_at,
        node.updated_at, emb.nonEmpty, emb.map(_.vector), out, in)
    }
  }

  private def edgeInfos(df: DataFrame): Seq[EdgeInfo] =
    df.orderBy($"id").as[EdgeRow].collect()
      .map(e => EdgeInfo(e.id, e.source, e.target, e.etype, e.weight)).toSeq

  /** PUT /nodes/{id} (O2+O21, app.py:794-821): partial update; embedding
    * precedence explicit > regen (re-encode of the NEW text) > keep. */
  def updateNode(id: String, text: Option[String] = None,
                 metadata: Option[Map[String, String]] = None,
                 regenEmbedding: Boolean = false,
                 embedding: Option[Seq[Float]] = None): Option[NodeDetails] = {
    catalog.nodes.filter($"id" === id).as[Node].collect().headOption.map { old =>
      val newText = text.getOrElse(old.text)
      catalog.upsertNode(old.copy(
        text = newText,
        metadata = metadata.getOrElse(old.metadata),
        updated_at = now()))
      embedding match {
        case Some(v) => catalog.upsertEmbedding(EmbeddingRow(id, v, v.length))
        case None if regenEmbedding =>
          val v = HashEmbed.encode(newText, dim).toSeq
          catalog.upsertEmbedding(EmbeddingRow(id, v, v.length))
        case None => ()
      }
      getNode(id).get
    }
  }

  /** DELETE /nodes/{id} (O4, app.py:824-834): cascade per TC-API-04. */
  def deleteNode(id: String): Boolean = {
    val exists = !catalog.nodes.filter($"id" === id).isEmpty
    if (exists) catalog.deleteNode(id)
    exists
  }

  def getAllNodes(): Seq[(String, String, Map[String, String])] =
    catalog.nodes.select($"id", $"text", $"metadata")
      .as[(String, String, Map[String, String])].collect().toSeq

  // ------------------------------------------------------------ edge CRUD
  /** POST /edges (O22, app.py:839-850): both endpoints must exist. */
  def createEdge(source: String, target: String, etype: String,
                 weight: Double = 1.0): Option[EdgeInfo] = {
    val endpoints = catalog.nodes.filter($"id".isin(source, target))
      .select($"id").as[String].collect().toSet
    if (!(endpoints.contains(source) && endpoints.contains(target))) None
    else {
      val e = EdgeRow(newId("edge"), source, target, etype, weight, now())
      catalog.upsertEdge(e)
      Some(EdgeInfo(e.id, e.source, e.target, e.etype, e.weight))
    }
  }

  def getEdge(id: String): Option[EdgeInfo] =
    catalog.edges.filter($"id" === id).as[EdgeRow].collect().headOption
      .map(e => EdgeInfo(e.id, e.source, e.target, e.etype, e.weight))

  /** PUT /edges/{id} (O8, app.py:288-308): partial, coalesce-with-current. */
  def updateEdge(id: String, etype: Option[String] = None,
                 weight: Option[Double] = None): Option[EdgeInfo] = {
    catalog.edges.filter($"id" === id).as[EdgeRow].collect().headOption.map { old =>
      val updated = old.copy(
        etype = etype.getOrElse(old.etype),
        weight = weight.getOrElse(old.weight))
      catalog.upsertEdge(updated)
      EdgeInfo(updated.id, updated.source, updated.target, updated.etype, updated.weight)
    }
  }

  def deleteEdge(id: String): Boolean = {
    val exists = !catalog.edges.filter($"id" === id).isEmpty
    if (exists) catalog.deleteEdge(id)
    exists
  }

  // -------------------------------------------------------------- search
  /** POST /search/vector (O12, app.py:394-444): full-scan top-k with
    * dim-mismatch skip and exact-match AND metadata filter. The reference
    * post-filters after ranking; filtering before top-k yields identical
    * results (truncation happens after filtering either way,
    * app.py:427-442) and lets Catalyst push the predicate down. */
  def vectorSearch(queryText: String, topK: Int = 10,
                   metadataFilter: Map[String, String] = Map.empty,
                   mode: AnnMode = AnnMode.BruteForce): Seq[VectorHit] = {
    val q = HashEmbed.encode(queryText, dim)
    val eligible = catalog.embeddings.filter($"dim" === q.length)
    // approximate modes prune to an index candidate set FIRST; brute force
    // (the reference contract) scores everything. Either way, survivors
    // get the exact reference scoring below — same dot product, same
    // metadata post-filter, same (score desc, id) order.
    val candidates = mode match {
      case AnnMode.BruteForce => eligible
      case approx =>
        val qd = q.toSeq.map(_.toDouble)
        // with a metadata filter, over-fetch so post-filtering the
        // candidate set can still fill topK (the post-filter ANN shape;
        // Similarity.filteredTopKAuto is the auto-deciding batch form)
        val budget = if (metadataFilter.isEmpty) topK else topK * 4
        val cand = approx match {
          case AnnMode.TrainedIvf(nprobe) =>
            graft.pipeline.Similarity.ivfTopKWith(
              eligible, "node_id", "vector", trainedQuantizer(), qd,
              k = budget, nprobe = nprobe)
          case AnnMode.Sq8(rerank) =>
            // serving form: the snapshot-cached scale — a query must not
            // pay a corpus-wide max-|x| agg for a number that only
            // changes on write (trained once per version, persistable)
            graft.pipeline.Similarity.sq8TopKWithScale(
              eligible, "node_id", "vector", sq8TrainedScale(), qd,
              k = budget, rerank = math.max(rerank, budget))
          case AnnMode.BruteForce => throw new IllegalStateException
        }
        // Serving invariant: an approximate mode must never silently
        // return nothing when the corpus has matches. The candidate set
        // is ≤ budget rows by construction, so collecting it is cheap
        // (this call collects the final result anyway); an EMPTY
        // candidate set on a non-empty corpus means a degenerate index
        // artifact — fall back to brute force and count it (test hook)
        // rather than propagate an empty answer.
        val candIds = cand.select($"node_id".cast("string")).as[String].collect()
        if (candIds.isEmpty) {
          annFallbackCount += 1
          Console.err.println(s"[graft] approximate mode $approx produced " +
            "no candidates; serving this query brute-force")
          eligible
        } else eligible.filter($"node_id".isin(candIds: _*))
    }
    val scored = candidates
      .select($"node_id".as("id"),
        vec.dot($"vector", typedlit(q.toSeq.map(_.toDouble))).as("vector_score"))
      .join(catalog.nodes, "id")
    val filtered = metadataFilter.foldLeft(scored) { case (df, (k, v)) =>
      df.filter(element_at($"metadata", k) === v)
    }
    filtered
      .orderBy($"vector_score".desc, $"id")
      .limit(topK)
      .select($"id", $"text", $"metadata", $"vector_score".as("vectorScore"))
      .as[VectorHit].collect().toSeq
  }

  /** Session-scoped trained coarse quantizer over the current embeddings
    * snapshot (2 k-means refinement rounds over a √n-spaced seed —
    * [[graft.pipeline.Similarity.kmeansCentroids]]), cached by the
    * embeddings snapshot version exactly like the BM25 index: training is
    * paid on the first TrainedIvf search after a mutation, not per query
    * and not per write. */
  @volatile private var quantizerCache: Option[(Long, DataFrame)] = None

  /** Test hook: quantizer TRAININGS this session (loads don't count) —
    * lets AnnPersistSpec prove a warmed restart serves without retraining. */
  @volatile private[graft] var quantizerTrainCount: Int = 0

  /** Test hook: how often an approximate serving call fell back to brute
    * force because its candidate set came back empty — the safety net
    * behind the non-empty-candidate serving invariant. Zero in healthy
    * operation. */
  @volatile private[graft] var annFallbackCount: Int = 0

  /** SQ8's one trained parameter — the snapshot's global max-|x| scale —
    * version-keyed exactly like the coarse quantizer; one corpus agg per
    * snapshot instead of per query. */
  @volatile private var sq8ScaleCache: Option[(Long, Double)] = None

  /** Test hook: SQ8 scale TRAININGS (corpus scans) this session. */
  @volatile private[graft] var sq8TrainCount: Int = 0

  private def sq8TrainedScale(): Double = annTrainLock.synchronized {
    val v = catalog.embeddingsVersion
    sq8ScaleCache match {
      case Some((ver, sc)) if ver == v => sc
      case _ =>
        sq8TrainCount += 1
        val row = catalog.embeddings.filter($"dim" === dim)
          .agg(max(array_max(transform($"vector".cast("array<double>"),
            x => abs(x)))))
          .head()
        val sc = if (row.isNullAt(0)) 1.0 else row.getDouble(0)
        sq8ScaleCache = Some((v, sc))
        sc
    }
  }

  /** Guards the quantizer/scale memo read-modify-writes: training twice
    * under a concurrent-read race wastes work, and a torn read of
    * (version, artifact) pairs could serve a stale artifact against a
    * fresh snapshot. One lock per engine — training is rare (per
    * mutation, not per query) so contention is nil. */
  private val annTrainLock = new Object

  private def trainedQuantizer(): DataFrame = annTrainLock.synchronized {
    val v = catalog.embeddingsVersion
    quantizerCache match {
      case Some((ver, cent)) if ver == v => cent
      case _ =>
        quantizerTrainCount += 1
        // node_id is a string; kmeansCentroids spaces integer ids, so key
        // the training view by the id hash. Seeds must be non-empty BY
        // CONSTRUCTION: raw hash keys mod spacing select zero rows with
        // P ≈ e^(−√n) over random UUIDs (the r13 AnnMode flake — empty
        // centroids → empty candidates → empty search result). Take the
        // numSeeds smallest hash keys instead: deterministic given ids,
        // ≥ 1 seed whenever the corpus is non-empty, and bounded by
        // min(⌈√n⌉, kMax) rows — a distributed top-k (TakeOrdered), no
        // global sort materialized.
        val keyed = catalog.embeddings.filter($"dim" === dim)
          .select(xxhash64($"node_id").as("kid"), $"vector")
        val n = keyed.count()
        val numSeeds = math.max(1L, math.min(
          math.ceil(math.sqrt(n.toDouble)).toLong,
          graft.pipeline.Similarity.kMax))
        val seeds = keyed.orderBy($"kid").limit(numSeeds.toInt)
        val cent = graft.pipeline.Similarity
          .kmeansCentroids(keyed, "kid", "vector", iters = 2,
            corpusN = n, seeds = seeds)
          .localCheckpoint()
        quantizerCache = Some((v, cent))
        cent
    }
  }

  /** BM25 keyword search (O15). Declared capability: built + queryable even
    * though no reference endpoint exposes it (app.py:670-672 keeps it out
    * of hybrid; SURVEY authoritative-source note).
    *
    * The index is built once per node-snapshot version and reused across
    * queries (version-keyed cache — the reference's rebuild-on-write
    * contract, app.py:772-773, with the rebuild amortized to the first
    * search after a mutation instead of every write). */
  @volatile private var bm25Cache: Option[(Long, graft.search.Bm25Index)] = None

  private def bm25Index(): graft.search.Bm25Index = {
    val v = catalog.nodesVersion
    bm25Cache match {
      case Some((ver, idx)) if ver == v => idx
      case _ =>
        val idx = Bm25.build(catalog.nodes, "id", "text")
        bm25Cache = Some((v, idx))
        idx
    }
  }

  def bm25Search(queryText: String, topK: Int = 10): Seq[Bm25Hit] = {
    val terms = queryText.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    if (terms.isEmpty) Seq.empty
    else Bm25.search(bm25Index(), terms.distinct, topK)
      .as[(String, Double)].collect().map { case (i, s) => Bm25Hit(i, s) }.toSeq
  }

  /** GET /search/graph (O19, app.py:893-903): None when start missing. */
  def graphSearch(startId: String, depth: Int = 2,
                  edgeType: Option[String] = None): Option[GraphSearchResult] = {
    if (catalog.nodes.filter($"id" === startId).isEmpty) None
    else {
      val bfs = Bfs.traverse(catalog.edges, lit(startId), depth,
        srcCol = "source", dstCol = "target", weightCol = "weight",
        edgeType = edgeType.map(("etype", _)))
      val nodes = bfs.filter($"node" =!= startId) // start excluded, app.py:599
        .join(catalog.nodes, $"node" === $"id")
        .orderBy($"dist", $"node")
        .select($"id", $"text", $"metadata", $"dist".as("distance"),
          $"path_weight".as("pathWeight"))
        .as[GraphNodeHit].collect().toSeq
      val induced = GraphOps.inducedEdges(catalog.edges, bfs,
        srcCol = "source", dstCol = "target")
      Some(GraphSearchResult(startId, depth, edgeType, nodes, edgeInfos(induced)))
    }
  }

  /** POST /search/hybrid (O20, app.py:657-736): weighted vector+graph
    * fusion as one composed plan; BM25 deliberately not fused. */
  def hybridSearch(queryText: String, vectorWeight: Double = 0.7,
                   graphWeight: Double = 0.3, topK: Int = 10,
                   graphStartId: Option[String] = None,
                   graphDepth: Int = 2): Option[Seq[HybridHit]] = {
    if (graphStartId.exists(s => catalog.nodes.filter($"id" === s).isEmpty))
      None // 404 contract, app.py:909-910
    else {
      val q = HashEmbed.encode(queryText, dim)
      val vecScores = catalog.embeddings
        .filter($"dim" === q.length)
        .select($"node_id".as("id"),
          vec.dot($"vector", typedlit(q.toSeq.map(_.toDouble))).as("vector_score"))
      val graphScores = graphStartId.map { start =>
        // hybrid BFS ignores edge_type (app.py:712)
        val bfs = Bfs.traverse(catalog.edges, lit(start), graphDepth,
          srcCol = "source", dstCol = "target", weightCol = "weight")
        GraphOps.closeness(bfs, lit(start), graphDepth)
          // the anchor's graph contribution is zeroed: the reference's own
          // harness (test_final.py:749-779) requires graph-only hybrid to
          // rank the closest TRUE neighbor first, which is impossible if
          // the start node itself returns at score 1.0 (app.py:564-565
          // does exactly that and fails its own TC-HYB-02). The harness is
          // the executable spec; O18's start=1.0 contract is unchanged in
          // GraphOps.closeness (q_graph_score stays oracle-exact).
          .filter($"node" =!= start)
          .select($"node".as("id"), $"graph_score")
      }
      val fused = HybridSearch.fuse(catalog.nodes, vecScores, graphScores,
        vectorWeight, graphWeight, topK)
      Some(fused.join(catalog.nodes.select($"id", $"text"), Seq("id"))
        .orderBy($"final_score".desc, $"id")
        .select($"id", $"text", $"vec_norm".as("vectorScore"),
          $"graph_score".as("graphScore"), $"final_score".as("finalScore"))
        .as[HybridHit].collect().toSeq)
    }
  }

  /** Whole-graph analytics over the store (GraphX path — beyond the
    * reference's ego traversals): connected components of the edge graph,
    * component labeled by its lexicographically smallest node id. */
  def connectedComponents(): Seq[(String, String)] =
    graft.graph.GraphXOps.connectedComponentsString(catalog.edges)
      .orderBy($"id")
      .as[(String, String)].collect().toSeq

  // --------------------------------------------- trained-ANN persistence
  /** Persist the trained ANN artifacts (round-9: at 100 TB a trained
    * index is a versioned durable artifact, not a warm cache — the
    * Bm25Index.save pattern). Trains the coarse quantizer if the cache
    * is cold, stamps the CONTENT fingerprint of the embeddings snapshot
    * ([[graft.search.AnnArtifacts.fingerprintOf]] — order-independent,
    * survives restarts where the session version counter does not). */
  def saveAnnIndex(dir: String): Unit =
    graft.search.AnnArtifacts(
      centroids = trainedQuantizer(),
      // PQ codebooks belong to the batch pipeline API, where the caller
      // owns the artifact (Similarity.pqTopKWith) — the facade serves
      // IVF + SQ8, so those are what it persists
      pqCodebook = None, sq8Scale = Some(sq8TrainedScale()),
      fingerprint = graft.search.AnnArtifacts.fingerprintOf(catalog.embeddings))
      .save(dir)

  /** Warm the quantizer cache from a persisted artifact. Serves ONLY if
    * the stored fingerprint matches the live embeddings snapshot —
    * a stale artifact is refused (returns false) and the next TrainedIvf
    * search retrains, never silently serving the wrong snapshot. */
  def loadAnnIndex(dir: String): Boolean = {
    val art = graft.search.AnnArtifacts.load(spark, dir)
    if (art.fingerprint ==
        graft.search.AnnArtifacts.fingerprintOf(catalog.embeddings)) {
      annTrainLock.synchronized {
        quantizerCache =
          Some((catalog.embeddingsVersion, art.centroids.localCheckpoint()))
        art.sq8Scale.foreach(sc =>
          sq8ScaleCache = Some((catalog.embeddingsVersion, sc)))
      }
      true
    } else false
  }

  /** O13: rebuild_index — scan-based vector search needs no index
    * (app.py:390-392, readme.md:181); for BM25 this drops the cached
    * derived index so the next search rebuilds from the current snapshot. */
  def rebuildIndex(): Unit = {
    bm25Cache = None; quantizerCache = None; sq8ScaleCache = None
  }

  /** GET / health (O23, app.py:923-926). */
  def health(): Map[String, String] =
    Map("status" -> "ok", "service" -> "vector-graph-engine")

  /** GET /stats (O23, app.py:929-940). */
  def stats(): Stats = Stats(
    catalog.nodes.count(),
    catalog.embeddings.count(),
    catalog.edges.count())
}
