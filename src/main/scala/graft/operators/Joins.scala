package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks as built-ins, each implemented as a
  * shuffle-bounded composition of built-in operators (SURVEY §7.2 preference
  * order (a): compose existing ops — all three stay fully Catalyst-visible,
  * no custom physical nodes needed).
  *
  * The reference has only equi/semi/anti joins (SURVEY §2.B cat 3); these
  * extend the engine with the temporal and range joins a training-data
  * pipeline needs (event↔snapshot alignment, numeric band matching) plus the
  * skew-salting harness for hot keys.
  */
object Joins {

  /** Distributed backward as-of join: for each left row, attach the payload
    * of the right row with the same key and the greatest `rightTime <=
    * leftTime`; ties on time resolve to the greatest payload (put a unique
    * column first in `payload`). No right match → null payload columns.
    *
    * Implementation is the union-and-window scan, not a range join: tag both
    * inputs, union, and take `last(payload, ignoreNulls)` over a
    * (key)-partitioned (time, side, payload) ordering. ONE shuffle on the
    * key, O(n log n) per partition, no candidate-pair explosion — at 100 TB
    * this is a single sort-shuffle where a naive time-range join would build
    * (left × right-per-key) candidates and re-aggregate them.
    */
  def asofBackward(left: DataFrame, leftKey: String, leftTime: String,
                   right: DataFrame, rightKey: String, rightTime: String,
                   payload: Seq[String]): DataFrame = {
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val pStruct = struct(payload.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val pType = right.select(pStruct.as("s")).schema("s").dataType
    val l = left.select(col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), lStruct.as("__l"), lit(null).cast(pType).as("__p"))
    // SQL join semantics: a NULL key or NULL time on the right can never
    // match (nulls-first ordering would otherwise hand a NULL-time payload
    // to every left row); NULL-key/time left rows fall through to a null
    // payload naturally
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), lit(null).cast(lType).as("__l"), pStruct.as("__p"))
    // right rows sort before the co-timed left row (__side 0 < 1) so the
    // match is inclusive; among co-timed right rows the greatest payload
    // struct wins because `last` reads the frame in sort order
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col("__l").getField(c).as(c)).toSeq ++
        payload.map(p => col("__asof").getField(p).as(p)): _*)
  }

  /** Band join: all (left, right) pairs with `|leftVal - rightVal| < width`.
    *
    * Binned equi-join: both sides bucket to `floor(val / width)`; the right
    * side is replicated into its own and both neighbor bins, so every
    * qualifying pair meets in exactly the left row's bin (|l−r| < width ⇒
    * bins differ by ≤ 1) — no dedup pass. The shuffle is keyed on the bin:
    * work scales with rows-per-band, where the naive theta-join Spark would
    * otherwise plan is a broadcast nested loop over the full cross product.
    * Column names must be disjoint across the two inputs.
    */
  def bandJoin(left: DataFrame, leftVal: String,
               right: DataFrame, rightVal: String, width: Double): DataFrame = {
    val l = left.withColumn("__bin", floor(col(leftVal) / width).cast("long"))
    val r = right.withColumn("__bin",
      explode(array(Seq(-1L, 0L, 1L).map(d =>
        floor(col(rightVal) / width).cast("long") + d): _*)))
    l.join(r, "__bin")
      .filter(abs(col(leftVal) - col(rightVal)) < width)
      .drop("__bin")
  }

  /** Skew-salted equi-join: a hot left key hashes all its rows to one task;
    * salting splits each key across `salt` sub-keys (via a deterministic
    * per-row `saltExpr` in [0, salt)) and replicates the small right side
    * once per sub-key, so the hot key's rows spread over `salt` tasks.
    * Result equals the plain inner equi-join. Column names must be disjoint.
    */
  def saltedJoin(left: DataFrame, leftKey: String, saltExpr: Column,
                 right: DataFrame, rightKey: String, salt: Int): DataFrame = {
    val l = left.withColumn("__salt", saltExpr.cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, col(leftKey) === col(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
