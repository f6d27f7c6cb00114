package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression utilities shared across the ops package. */
object Cols {

  /** Bind an expensive expression as a lambda VARIABLE for use inside
    * higher-order array functions. Spark's HOFs (`transform`, `filter`,
    * `aggregate`, …) are interpreted, and a lambda body re-evaluates
    * every captured EXPRESSION per element — so e.g. referencing a
    * `split()` from inside a nested lambda re-runs the split once per
    * element per reference (measured: 15 s → 2 s on the sf0.1 corpus
    * for the repetition features). Wrapping the expression in a
    * one-element array and `transform`-ing over it makes it a bound
    * variable: evaluated exactly once per row, then referenced for
    * free. `element_at(_, 1)` (1-based) unwraps the result. */
  def bound(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)
}
