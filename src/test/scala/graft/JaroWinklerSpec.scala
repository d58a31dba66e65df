package graft

import org.apache.spark.sql.functions._

/** The custom Jaro-Winkler codegen expression: golden values pinned to
  * DuckDB 1.0's jaro_winkler_similarity output (exact doubles printed by
  * the oracle engine — cross-engine, not self-referential), kernel
  * eval == codegen, and planted-corruption recall through the declared
  * blocked linkage join. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, exact double DuckDB 1.0 returns)
  private val golden = Seq(
    ("martha", "marhta", 0.9611111111111111),   // classic transposition
    ("dwayne", "duane", 0.8400000000000001),    // prefix bonus applied
    ("dixon", "dicksonx", 0.8133333333333332),
    ("abcdefgh", "abcdWXYZ", 0.6666666666666666), // jaro<=0.7: NO bonus
    ("abcdefgh", "abXYZUVW", 0.5),
    ("ab", "ba", 0.0),                          // window 0: no matches
    ("abc", "abc", 1.0),
    ("a", "", 0.0), ("", "a", 0.0), ("", "", 0.0)) // DuckDB: empty -> 0

  test("kernel matches DuckDB golden doubles exactly (eval path)") {
    import org.apache.spark.unsafe.types.UTF8String
    golden.foreach { case (a, b, want) =>
      val got = graft.functions.JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == want, s"'$a'~'$b': $got != $want")
    }
  }

  test("codegen path agrees with eval path on random pairs") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(120)(rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
    val pairs = strs.zip(strs.reverse) ++ golden.map(g => (g._1, g._2))
    val df = pairs.toDF("a", "b")
    val viaPlan = df // projection -> whole-stage codegen path
      .select(graft.functions.JaroWinkler.of($"a", $"b").as("jw"))
      .as[Double].collect().toSeq
    val viaEval = pairs.map { case (a, b) =>
      graft.functions.JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
    }
    assert(viaPlan == viaEval)
  }

  test("blocked linkage join recalls every planted corrupted twin") {
    val got = SparkEntry.queries("q_link_jw")(spark, sf)
      .select($"a_id", $"b_id", $"jw").as[(Long, Long, Double)]
      .collect().toSeq
    assert(got.nonEmpty)
    val n = Tables(spark, sf, "documents")
      .filter($"doc_id" < 40).count()
    assert(n > 0)
    val planted = got.filter { case (a, b, _) => b == a + 1000000 }
    assert(planted.size == n, s"recalled ${planted.size} of $n planted twins")
    // a 2-char end-corruption of a >=20-char name scores very high
    planted.foreach { case (_, _, jw) => assert(jw >= 0.9) }
    got.foreach { case (_, _, jw) => assert(jw >= 0.9 && jw <= 1.0) }
  }
}
