package graft.pipeline

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** Deterministic heavy-hitters candidate generation: the Misra–Gries
  * frequent-items summary (Misra & Gries 1982) as a mergeable Spark
  * [[Aggregator]].
  *
  * Guarantee: with k counters, every key whose true frequency exceeds
  * n/k appears among the surviving counters — each decrement retires k
  * distinct occurrences at once, so a key can lose at most n/k count and
  * a >n/k key can never reach zero. The merge (sum counter maps, then
  * subtract the k-th largest summed count from every counter and drop
  * the non-positives) preserves that error bound, which is what makes
  * the summary safe to combine across partitions in any order (Agarwal
  * et al., "Mergeable Summaries", PODS'12). The candidate SET can vary
  * with partition merge order — only the superset guarantee is
  * order-independent — so a declared query must always follow the sketch
  * with an exact recount of the bounded candidate set; the recount
  * output IS deterministic (the exact heavy hitters).
  *
  * This is the deterministic complement to the CMS sketch family
  * (pipeline/Sketches.scala): CMS answers point queries with
  * probabilistic error; Misra–Gries yields a guaranteed-complete
  * candidate set of bounded size k−1 — O(k) state per partition, one
  * shuffle of k−1 counters, no randomness anywhere.
  *
  * The 100 TB shape: pass 1 reduces each partition to ≤ k−1 counters
  * (map-side combine), the driver-free merge tree combines them, and
  * pass 2 recounts only rows whose key is in the broadcast candidate
  * set — never a full groupBy over all distinct keys.
  */
object HeavyHitters {

  /** Misra–Gries with `k` counters over a string key column. Emits the
    * surviving candidate keys, sorted, as an array — ≤ k−1 entries. */
  private final case class MisraGries(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
    require(k >= 2, s"Misra-Gries needs k >= 2 counters (got $k)")

    override def zero: mutable.HashMap[String, Long] =
      mutable.HashMap.empty[String, Long]

    override def reduce(b: mutable.HashMap[String, Long],
                        key: String): mutable.HashMap[String, Long] = {
      if (key == null) return b
      b.get(key) match {
        case Some(c) => b.update(key, c + 1)
        case None if b.size < k - 1 => b.update(key, 1L)
        case None =>
          // decrement every counter; retire the zeros (k distinct
          // occurrences cancel — the move that bounds undercount by n/k)
          val dead = mutable.ArrayBuffer.empty[String]
          b.foreach { case (kk, c) =>
            if (c == 1L) dead += kk else b.update(kk, c - 1)
          }
          dead.foreach(b.remove)
      }
      b
    }

    override def merge(x: mutable.HashMap[String, Long],
                       y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      y.foreach { case (kk, c) => x.update(kk, x.getOrElse(kk, 0L) + c) }
      if (x.size > k - 1) {
        // subtract the k-th largest count from everyone; ≤ k−1 survive
        val cut = x.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
        val dead = mutable.ArrayBuffer.empty[String]
        x.foreach { case (kk, c) =>
          if (c - cut <= 0L) dead += kk else x.update(kk, c - cut)
        }
        dead.foreach(x.remove)
      }
      x
    }

    override def finish(b: mutable.HashMap[String, Long]): Seq[String] =
      b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }

  /** Aggregate column: Misra–Gries candidate keys (≤ k−1, sorted) for a
    * string key column. Every key with frequency > n/k is guaranteed
    * present; follow with an exact recount to drop the false positives. */
  def candidates(key: Column, k: Int): Column = udaf(MisraGries(k)).apply(key)

  /** Counter-bearing variant of [[MisraGries]]: finishes to the
    * surviving (key, residual count) pairs, key-sorted — the form a
    * STREAMING maintainer needs, because merging summaries requires the
    * counts, not just the keys. */
  private final case class MisraGriesCounts(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {
    private val inner = MisraGries(k)
    override def zero: mutable.HashMap[String, Long] = inner.zero
    override def reduce(b: mutable.HashMap[String, Long], key: String)
        : mutable.HashMap[String, Long] = inner.reduce(b, key)
    override def merge(x: mutable.HashMap[String, Long],
                       y: mutable.HashMap[String, Long])
        : mutable.HashMap[String, Long] = inner.merge(x, y)
    override def finish(b: mutable.HashMap[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy(_._1)
    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Aggregate column: the full (key, count) Misra–Gries summary. */
  def summary(key: Column, k: Int): Column = udaf(MisraGriesCounts(k)).apply(key)

  /** The PODS'12 mergeable-summaries merge on plain maps — sum counts,
    * subtract the k-th largest total from everyone, drop non-positives.
    * Exposed so a streaming maintainer holding its ≤ k−1-row state
    * outside an Aggregator buffer applies EXACTLY the same rule. */
  def mergeCounts(x: Map[String, Long], y: Map[String, Long], k: Int)
      : Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    x.foreach { case (kk, c) => m.update(kk, m.getOrElse(kk, 0L) + c) }
    y.foreach { case (kk, c) => m.update(kk, m.getOrElse(kk, 0L) + c) }
    if (m.size > k - 1) {
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      m.filterInPlace { case (_, c) => c - cut > 0L }
        .mapValuesInPlace { case (_, c) => c - cut }
    }
    m.toMap
  }
}
