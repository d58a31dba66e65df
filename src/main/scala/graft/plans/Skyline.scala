package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, SinglePartition}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.bridge

/** Pareto-skyline as a WHOLE-OPERATOR Catalyst extension — the brief's
  * preference path (c): a custom `LogicalPlan` node, a `SparkStrategy`
  * that plans it, and a `SparkPlan` that executes it, injected through the
  * public `spark.experimental.extraStrategies` hook.
  *
  * Semantics: keep exactly the rows NOT DOMINATED by any other row. Row a
  * dominates row b when a is ≤ b on every `minCols` dimension, ≥ b on
  * every `maxCols` dimension, and STRICTLY better on at least one.
  * Incomparable ties (equal on every dimension, or each better somewhere)
  * are all kept — the operator is a filter, never a ranking.
  *
  * Why a custom operator: the relational formulation is a NOT EXISTS
  * dominance self-join — a quadratic non-equi join no optimizer can turn
  * into anything better (that exact formulation IS the DuckDB oracle for
  * q_skyline). The classic distributed algorithm (two-phase block-nested-
  * loop skyline) is not expressible as a composition of Spark operators
  * without the quadratic join, so it earns the custom-plan treatment:
  *
  * Scale shape (100 TB): phase 1 computes a LOCAL skyline per input
  * partition with an in-memory dominance window — embarrassingly parallel,
  * one pass, no shuffle, and the pruning is massive (a partition's skyline
  * is O(polylog) of its rows for independent dimensions). Phase 2 merges
  * the surviving candidates — already reduced by orders of magnitude — on
  * a single task with the same window algorithm. Local skylines are
  * correct to merge because dominance is transitive and a globally
  * non-dominated row is non-dominated in every subset containing it, so
  * phase 1 can never drop a true skyline row. The only data movement is
  * the candidate collapse; there is no global sort and no join anywhere.
  *
  * Rows with NULL in any skyline dimension are excluded up front (the
  * dominance order is undefined on them); the wrapper adds the
  * `IS NOT NULL` filters so both engines agree.
  */
object Skyline {

  /** Skyline of `df`: minimize every column in `minCols`, maximize every
    * column in `maxCols`. Registers [[SkylineStrategy]] on the session's
    * experimental strategies (idempotent) and wraps the result back into
    * the public DataFrame API. */
  def of(df: DataFrame, minCols: Seq[String], maxCols: Seq[String]): DataFrame = {
    require(minCols.nonEmpty || maxCols.nonEmpty, "skyline needs >= 1 dimension")
    val spark = df.sparkSession
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(SkylineStrategy))
      spark.experimental.extraStrategies = strategies :+ SkylineStrategy
    val clean = (minCols ++ maxCols)
      .foldLeft(df)((d, c) => d.filter(col(c).isNotNull))
    bridge.ofRows(spark, SkylineNode(minCols, maxCols, bridge.analyzed(clean)))
  }
}

/** Logical skyline node: pure semantics (dimension names + directions),
  * no execution choices. Output = child output — a skyline is a filter. */
final case class SkylineNode(minCols: Seq[String], maxCols: Seq[String],
                             child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  // dimension columns are referenced by NAME (resolved at planning time),
  // so declare every child column referenced — otherwise ColumnPruning
  // inserts a Project under the node and the dimensions vanish before
  // the strategy can resolve them
  override def references: AttributeSet = AttributeSet(child.output)
  override protected def withNewChildInternal(newChild: LogicalPlan): SkylineNode =
    copy(child = newChild)
}

/** Plans [[SkylineNode]] as [[SkylineExec]]; resolves dimension names to
  * child-output ordinals here, where the child schema is final. */
object SkylineStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SkylineNode(minCols, maxCols, child) =>
      def ordinal(name: String): Int = {
        val i = child.output.indexWhere(_.name == name)
        require(i >= 0, s"skyline dimension '$name' not in ${child.output.map(_.name)}")
        i
      }
      SkylineExec(minCols.map(ordinal), maxCols.map(ordinal), planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Two-phase block-nested-loop skyline (Börzsönyi et al., ICDE'01 BNL +
  * the standard partition/merge distribution): local skyline per
  * partition, then one merge task over the surviving candidates. */
final case class SkylineExec(minIdx: Seq[Int], maxIdx: Seq[Int],
                             child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = SinglePartition

  override protected def doExecute(): RDD[InternalRow] = {
    val types = child.output.map(_.dataType)
    // (ordinal, interpreted ordering, sign): sign +1 = minimize, -1 = maximize
    val dims: Array[(Int, Ordering[Any], Int)] =
      (minIdx.map(i => (i, TypeUtils.getInterpretedOrdering(types(i)), 1)) ++
        maxIdx.map(i => (i, TypeUtils.getInterpretedOrdering(types(i)), -1))).toArray
    val dimTypes = dims.map { case (i, _, _) => types(i) }

    def localSkyline(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
      // a dominates b: <= everywhere (after sign), < somewhere
      def dominates(a: InternalRow, b: InternalRow): Boolean = {
        var strict = false
        var k = 0
        while (k < dims.length) {
          val (i, ord, sign) = dims(k)
          val c = sign * ord.compare(a.get(i, dimTypes(k)), b.get(i, dimTypes(k)))
          if (c > 0) return false
          if (c < 0) strict = true
          k += 1
        }
        strict
      }
      val window = new ArrayBuffer[InternalRow]()
      iter.foreach { r =>
        if (!window.exists(w => dominates(w, r))) {
          val row = r.copy() // UnsafeRow buffers are reused by the scan
          var j = window.length - 1
          while (j >= 0) { // drop window rows the newcomer dominates
            if (dominates(row, window(j))) window.remove(j)
            j -= 1
          }
          window += row
        }
      }
      window.iterator
    }

    val local = child.execute().mapPartitions(localSkyline)
    // merge phase: candidates are each partition's (tiny) skyline; one
    // task folds them with the same window. coalesce(1) is deliberate —
    // no shuffle write, the merge task pulls each local skyline directly.
    local.coalesce(1).mapPartitions(localSkyline)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SkylineExec =
    copy(child = newChild)
}
