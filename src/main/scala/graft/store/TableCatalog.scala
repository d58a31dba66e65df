package graft.store

import graft.model.{EdgeRow, EmbeddingRow, Node}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-based mutable store over immutable DataFrames (SURVEY §7.4).
  *
  * The reference mutates SQLite in place with `INSERT OR REPLACE` + FK
  * cascades (app.py:126-348); here every mutation is a pure snapshot
  * transformation — upsert = key-anti-join ∪ new row, delete = anti-join
  * with cascades — and the new snapshot is `localCheckpoint`ed so lineage
  * stays O(1) across arbitrarily long mutation streams.
  *
  * At cluster scale the same contracts map to Delta/Iceberg MERGE and
  * partition-level rewrites; the snapshot-in-driver catalog is the
  * local-engine equivalent, and readers always see a consistent snapshot
  * (read-your-writes for the single-writer workload the reference's tests
  * exercise, app.py:79-82).
  */
final class TableCatalog(val spark: SparkSession) {
  import spark.implicits._

  @volatile private var nodesSnap: DataFrame =
    spark.emptyDataset[Node].toDF
  @volatile private var embeddingsSnap: DataFrame =
    spark.emptyDataset[EmbeddingRow].toDF
  @volatile private var edgesSnap: DataFrame =
    spark.emptyDataset[EdgeRow].toDF

  def nodes: DataFrame = nodesSnap
  def embeddings: DataFrame = embeddingsSnap
  def edges: DataFrame = edgesSnap

  /** Monotonic node-snapshot version — bumped by every node mutation so
    * derived-index caches (e.g. the Engine's BM25 index) can invalidate on
    * write, mirroring the reference's rebuild-on-mutation contract
    * (app.py:772-773) without rebuilding on read. */
  @volatile private var nodesVer: Long = 0L
  def nodesVersion: Long = nodesVer

  /** Monotonic embeddings-snapshot version — the invalidation key for
    * derived vector-index artifacts (the Engine's session-cached trained
    * coarse quantizer), same contract as [[nodesVersion]]. */
  @volatile private var embeddingsVer: Long = 0L
  def embeddingsVersion: Long = embeddingsVer

  /** O1/O2: upsert (INSERT OR REPLACE, app.py:131-134). */
  def upsertNode(n: Node): Unit = synchronized {
    nodesSnap = nodesSnap.filter($"id" =!= n.id)
      .unionByName(Seq(n).toDF).localCheckpoint()
    nodesVer += 1
  }

  /** O6: upsert embedding (app.py:238-241). */
  def upsertEmbedding(e: EmbeddingRow): Unit = synchronized {
    embeddingsSnap = embeddingsSnap.filter($"node_id" =!= e.node_id)
      .unionByName(Seq(e).toDF).localCheckpoint()
    embeddingsVer += 1
  }

  /** O8: upsert edge. */
  def upsertEdge(e: EdgeRow): Unit = synchronized {
    edgesSnap = edgesSnap.filter($"id" =!= e.id)
      .unionByName(Seq(e).toDF).localCheckpoint()
  }

  /** O4: delete node + FK cascade to its embedding and ALL incident edges
    * (app.py:81, 105, 118-119; verified by TC-API-04). */
  def deleteNode(id: String): Unit = synchronized {
    nodesSnap = nodesSnap.filter($"id" =!= id).localCheckpoint()
    embeddingsSnap = embeddingsSnap.filter($"node_id" =!= id).localCheckpoint()
    edgesSnap = edgesSnap.filter($"source" =!= id && $"target" =!= id)
      .localCheckpoint()
    nodesVer += 1
    embeddingsVer += 1
  }

  def deleteEdge(id: String): Unit = synchronized {
    edgesSnap = edgesSnap.filter($"id" =!= id).localCheckpoint()
  }

  /** Bulk upsert of node rows (same last-write-wins contract as
    * [[upsertNode]], one anti-join for the whole batch) — the sink for
    * streaming mutation ingestion (EventStreams.ingestNodes) and any batch
    * ETL append path. */
  def upsertNodes(batch: DataFrame): Unit = synchronized {
    nodesSnap = nodesSnap
      .join(batch.select("id"), Seq("id"), "left_anti")
      .unionByName(batch.select(nodesSnap.columns.map(col): _*))
      .localCheckpoint()
    nodesVer += 1
  }

  /** Bulk upsert of edge rows (streaming edge ingestion). */
  def upsertEdges(batch: DataFrame): Unit = synchronized {
    edgesSnap = edgesSnap
      .join(batch.select("id"), Seq("id"), "left_anti")
      .unionByName(batch.select(edgesSnap.columns.map(col): _*))
      .localCheckpoint()
  }

  /** Bulk load (e.g. from parquet snapshots) — replaces current snapshots. */
  def load(nodes: DataFrame, embeddings: DataFrame, edges: DataFrame): Unit =
    synchronized {
      nodesSnap = nodes.localCheckpoint()
      embeddingsSnap = embeddings.localCheckpoint()
      edgesSnap = edges.localCheckpoint()
      nodesVer += 1
      embeddingsVer += 1
    }

  /** Persist snapshots as parquet (the durable form of the store). */
  def save(dir: String): Unit = {
    nodesSnap.write.mode("overwrite").parquet(s"$dir/nodes.parquet")
    embeddingsSnap.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    edgesSnap.write.mode("overwrite").parquet(s"$dir/edges.parquet")
  }
}
