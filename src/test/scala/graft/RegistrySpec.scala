package graft

/** Declared-query registry integrity: the driver contract breaks silently
  * if names collide (later Map entry wins) or an oracle goes blank. */
class RegistrySpec extends SparkSpec {

  test("documented query count equals the registry — docs cannot drift") {
    assert(SparkEntry.queries.size == SparkEntry.declaredCount,
      s"update SparkEntry.declaredCount AND the README/SURVEY citations: " +
        s"registry has ${SparkEntry.queries.size}, docs say ${SparkEntry.declaredCount}")
  }

  test("registry names are unique and well-formed") {
    val names = SparkEntry.registry.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    assert(names.forall(_.matches("q[a-z0-9_]+")), "snake_case q-prefixed names")
  }

  test("oracles are non-blank and SELECT/WITH-shaped") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val t = sql.trim.toUpperCase
      assert(t.startsWith("SELECT") || t.startsWith("WITH"),
        s"$name oracle must be a plain query")
      assert(sql.length > 20, s"$name oracle suspiciously short")
    }
  }

  test("rows-only queries are the documented two") {
    // q_hash_embed graduated to a DuckDB oracle via the committed golden
    // token→bucket fixture; GraphX float-iterative PageRank and HLL++
    // registers remain genuinely inexpressible cross-engine (each has an
    // oracle-checked counterpart: q_graph_pagerank_exact, q_sketch_kmv/cms).
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(rowsOnly == Set("q_graphx_pagerank", "q_sketch_agg"),
      s"every other query needs a DuckDB oracle; got $rowsOnly")
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no declared output schema carries a decimal wider than precision 18") {
    // Round-8 lesson (CORRECTNESS_r08): Spark writes precision>18 decimals
    // as parquet FIXED_LEN_BYTE_ARRAY decimal128, the one physical type the
    // driver's hasher canonicalizes differently from DuckDB's decimal —
    // q_stats_mi / q_stats_changepoint hash-failed on exactly this class
    // while matching value-for-value. Wide decimals are for INTERNAL math
    // only; every declared OUTPUT column must be int64-backed or narrower
    // (decimal ≤ 18, or BIGINT/DOUBLE after an explicit, bounded cast).
    import org.apache.spark.sql.types.DecimalType
    def wide(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case d: DecimalType => d.precision > 18
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => wide(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => wide(a.elementType)
      case m: org.apache.spark.sql.types.MapType => wide(m.keyType) || wide(m.valueType)
      case _ => false
    }
    val offenders = SparkEntry.registry.flatMap { q =>
      val bad = q.run(spark, sf).schema.fields.filter(f => wide(f.dataType))
      bad.map(f => s"${q.name}.${f.name}: ${f.dataType.sql}")
    }
    assert(offenders.isEmpty,
      s"decimal128 outputs break the driver's parquet hasher — cast to " +
        s"BIGINT/DOUBLE/DECIMAL(<=18,s) with a documented bound:\n" +
        offenders.mkString("\n"))
  }
}
