package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) keys for multi-dimensional data clustering.
  *
  * Range-partitioning + sorting by an interleaved-bit key co-locates 2-D
  * neighborhoods in the same files, so min/max file statistics prune scans
  * on EITHER dimension — the layout trick behind data-skipping formats'
  * Z-ORDER clustering. At 100 TB this is a write-side investment: one
  * range-exchange at ingest buys bounded per-file key ranges for every
  * later selective read.
  */
object ZOrder {
  /** Bit-interleaved key of two non-negative `bits`-bit ints: x's bit i
    * goes to position 2i, y's to 2i+1. Pure integer column algebra
    * (shift/and/add) → whole-stage codegen; the DuckDB oracle mirrors the
    * same unrolled expression. */
  def interleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The same interleave as an ANSI-SQL fragment over column names —
    * the oracle side of [[interleave]]; both are generated from the same
    * bit positions so they cannot drift. */
  def interleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
