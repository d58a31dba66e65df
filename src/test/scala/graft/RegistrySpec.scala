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
}
