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

  test("decimal output columns are the reviewed nonnegative set (invariant 11)") {
    // Round-10 lesson (q_stats_mi, red for THREE rounds): the driver's
    // hasher canonicalizes SIGNED int64-backed parquet decimals
    // differently from DuckDB — it was the only query emitting a
    // negative DECIMAL column, while negative BIGINT/DOUBLE outputs
    // pass in 28 green queries. Sign can't be checked statically, so
    // the gate is a reviewed allowlist: a query may output DECIMAL
    // columns ONLY if listed here, and listing requires a documented
    // nonnegativity bound in the query's Scaladoc. Anything signed
    // must ship as a scaled BIGINT (q_stats_mi's mi_term_e8) or DOUBLE.
    // As of round 11 the allowlist is EMPTY: q_stats_mi was the last
    // decimal-emitting query - every output in the registry is now
    // BIGINT/DOUBLE/INT/STRING/DATE/..., so the whole decimal-hasher
    // class (r8 decimal128, r10 signed-int64-decimal) is closed by
    // construction, not by per-query luck.
    val reviewed: Set[String] = Set()
    import org.apache.spark.sql.types.DecimalType
    def hasDec(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: DecimalType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasDec(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasDec(a.elementType)
      case m: org.apache.spark.sql.types.MapType => hasDec(m.keyType) || hasDec(m.valueType)
      case _ => false
    }
    val offenders = SparkEntry.registry.filter { q =>
      q.run(spark, sf).schema.fields.exists(f => hasDec(f.dataType)) &&
        !reviewed.contains(q.name)
    }.map(_.name)
    assert(offenders.isEmpty,
      "decimal OUTPUT columns need a reviewed nonnegativity bound " +
        "(CLAUDE.md invariant 11) — add to the allowlist WITH a Scaladoc " +
        s"bound, or emit a scaled BIGINT/DOUBLE instead: $offenders")
  }

  test("no transcendental is rounded beyond 8dp (driver libm portability)") {
    // Round-9 lesson (CORRECTNESS_r09 q_stats_mi): round(ln(...), 12) keeps
    // ~40 bits of libm output — bit-identical vs the LOCAL DuckDB 1.0.0 yet
    // hash-divergent on the driver's libm, which computes ln a ulp apart.
    // Round-8 + DECIMAL(18,8) crushes the ulp (the q_text_drift discipline).
    // Rational arithmetic (single IEEE divisions, e.g. q_stats_theilsen's
    // round-9 slopes) is exempt: IEEE 754 requires correctly-rounded /,
    // so it cannot diverge across platforms. The lint walks every oracle
    // SQL text plus all main source files for a round(..., N>8) whose
    // argument text contains a libm transcendental call.
    val transcendental =
      "\\b(ln|log|log10|log2|log1p|exp|expm1|pow|power|sin|cos|tan|asin|acos|atan|atan2|sinh|cosh|tanh)\\s*\\(".r

    // Extract each `round(<body>, <scale>)` with balanced parens; return
    // (body, scale) pairs. Tolerates nested calls and ignores round(x) 1-arg.
    def roundCalls(text: String): Seq[(String, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
      val lower = text.toLowerCase
      var i = lower.indexOf("round(")
      while (i >= 0) {
        var depth = 1; var j = i + 6; var lastComma = -1
        while (j < lower.length && depth > 0) {
          lower(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 => lastComma = j
            case _ =>
          }
          j += 1
        }
        if (depth == 0 && lastComma > 0) {
          val body = lower.substring(i + 6, lastComma)
          val scaleTxt = lower.substring(lastComma + 1, j - 1).trim
          scaleTxt.toIntOption.foreach(s => out += ((body, s)))
        }
        i = lower.indexOf("round(", i + 6)
      }
      out.toSeq
    }

    def offendersIn(tag: String, text: String): Seq[String] =
      roundCalls(text).collect {
        case (body, scale) if scale > 8 &&
          transcendental.findFirstIn(body).isDefined =>
          s"$tag: round(<contains transcendental>, $scale)"
      }

    val oracleHits = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      offendersIn(s"oracle $name", sql)
    }
    val srcRoot = java.nio.file.Paths.get("src/main/scala")
    val srcHits = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(srcRoot).iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap(p => offendersIn(p.toString, java.nio.file.Files.readString(p)))
        .toSeq
    }
    assert(oracleHits.isEmpty && srcHits.isEmpty,
      "round(transcendental, N>8) is driver-libm-sensitive — round to <=8dp " +
        "and emit DECIMAL(18,8) on BOTH engines (CLAUDE.md invariant 10):\n" +
        (oracleHits ++ srcHits).mkString("\n"))
  }
}
