package graft.operators

import graft.pipeline.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pre-filter: build a tiny bit array from the
  * join keys of the SMALL side, broadcast it, and drop big-side rows that
  * cannot possibly match before the real join — the runtime-filter trick
  * (Spark's own InjectRuntimeFilter, and every warehouse engine) that
  * turns "shuffle 100 TB then discard 99%" into "scan-side discard 99%,
  * shuffle 1%". False positives survive the filter (and are removed by
  * the exact join that follows); false negatives are impossible.
  *
  * The filter is an aggregated map widx→word of 63 usable bits (bit 63 stays clear: DuckDB raises
  * on 1<<63 signed overflow while Spark wraps — ⌈m/63⌉ entries, one row) rather than a driver-side sketch: build is one partial-agg
  * shuffle, probe is a broadcast of a few hundred bytes. Hashes are the
  * md5-derived [[TextOps.strHash]], so a DuckDB oracle can reproduce the
  * exact same bit pattern — k positions per key, j-salted.
  */
object BloomJoin {
  /** k hash positions of a key in an m-bit filter via Kirsch-Mitzenmacher
    * double hashing: pos_j = (h₁ + j·h₂) mod m from ONE md5 — k
    * independent-enough probes at a third of the hashing cost (the probe
    * side pays one digest per row, not k). h₂ is forced odd so it is
    * coprime to the power-of-two m (probes cycle all positions). */
  def positions(key: Column, k: Int, mBits: Int): Column = {
    val h = TextOps.strHash(key.cast("string"))
    val h1 = h % mBits
    val h2 = (shiftright(h, 10) % mBits).bitwiseOR(lit(1L))
    array((0 until k).map(j => (h1 + lit(j.toLong) * h2) % mBits): _*)
  }

  /** Aggregate the small side's keys to a one-row map widx → word. */
  def buildWords(dim: DataFrame, key: Column, k: Int, mBits: Int): DataFrame =
    dim.select(explode(positions(key, k, mBits)).as("pos"))
      .select((col("pos") / 63).cast("int").as("widx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").as("w"))
      .groupBy("widx").agg(expr("bit_or(w)").as("bits"))
      .agg(map_from_entries(collect_list(struct(col("widx"), col("bits"))))
        .as("bloom"))

  /** Keep only big-side rows whose key tests positive in the filter:
    * all k bits set. One broadcast nested-loop of a 1-row map + a
    * codegen'd forall — no shuffle, no explode of the big side. */
  def probe(big: DataFrame, key: Column, words: DataFrame,
            k: Int, mBits: Int): DataFrame =
    big.withColumn("__pos", positions(key, k, mBits))
      .crossJoin(broadcast(words))
      .filter(expr(
        """forall(__pos, p ->
          |  (shiftright(coalesce(element_at(bloom, CAST(p div 63 AS INT)),
          |                       CAST(0 AS BIGINT)),
          |              CAST(p % 63 AS INT)) & 1) = 1)""".stripMargin))
      .drop("__pos", "bloom")

  /** DuckDB fragment for position j (mirrors [[positions]] exactly). */
  def positionSql(key: String, j: Int, mBits: Int): String = {
    val h = s"(CAST(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 15)) AS BIGINT)" +
      s" % ${TextOps.P})"
    s"((($h % $mBits) + $j * ((($h // 1024) % $mBits) | 1)) % $mBits)"
  }
}
