package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[QueryDef]] in [[registry]]; the
  * driver runs each through [[Verify]] (parquet dump → DuckDB oracle compare)
  * and [[Bench]] (timing at sf0.1).
  */
object SparkEntry {

  /** All declared operator queries, grouped by module. */
  def registry: Seq[QueryDef] =
    rel.RelQueries.all ++ rel.VectorQueries.all ++ rel.GraphQueries.all ++
      rel.GraphXQueries.all ++ rel.PipelineQueries.all ++ rel.StreamQueries.all ++
      rel.ExtQueries.all ++ rel.ScaleQueries.all ++ rel.TpchQueries.all ++
      rel.SelectionQueries.all ++ rel.AnalyticQueries.all ++
      rel.QualityQueries.all ++ rel.SpatialQueries.all ++
      rel.TemporalQueries.all ++ rel.EvalQueries.all ++
      rel.InferenceQueries.all

  /** THE documented query count — the single source of truth README and
    * SURVEY cite. RegistrySpec asserts it equals `queries.size`, so the
    * docs can never drift from the registry again (they did: 194 was
    * still documented when 196 were declared). */
  val declaredCount: Int = 347

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The hybrid fusion pipeline — the reference's distinguishing operator
    * (vector scores ⊕ graph closeness, one composed Catalyst plan). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_hybrid")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Session-memoized derivations shared by MULTIPLE declared queries
    * (SGNS training, the eval clipped-count base frame). Bench forces
    * these untimed — like the Tables-reader warm-up — so a one-time
    * shared derivation is not charged to whichever sharer runs first
    * alphabetically; the warm seconds are published in the bench JSON. */
  val sharedWarmups: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "sgns_training" -> (rel.SelectionQueries.warmShared(_, _)),
    "eval_base_frame" -> (rel.EvalQueries.warmShared(_, _)),
    "trained_quantizers" -> (rel.PipelineQueries.warmShared(_, _)),
    "pca_parts" -> (rel.VectorQueries.warmShared(_, _)))
}
