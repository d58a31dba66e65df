package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the declared-query modules. */
package object rel {
  /** The CLAUDE.md float-discipline cast: order-sensitive double sums go
    * through DECIMAL(18,2) (exact + associative in both engines) and come
    * back as doubles. One definition so the scale can never diverge
    * between query modules. */
  private[rel] def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
}
