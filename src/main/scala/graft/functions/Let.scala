package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Let-binding for expression trees: evaluate `value` ONCE per row and
  * reference the result through a lambda variable.
  *
  * Catalyst does not common-subexpression-eliminate an outer expression
  * referenced inside a higher-order-function lambda — each array element
  * re-evaluates the full subtree. `transform(sequence(...), j =>
  * f(expensive, j))` therefore turns an O(n) pass into O(n^2) work (and
  * worse when nested). Wrapping the expensive subtree in a single-element
  * array and `transform`-ing over it binds it to a `NamedLambdaVariable`,
  * which IS evaluated once — the classic let-over-lambda encoding.
  */
object Let {

  def let(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)
}
