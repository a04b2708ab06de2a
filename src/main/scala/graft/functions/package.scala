package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, element_at, transform}

package object functions {

  /** Let-binding for expression trees: evaluates `v` ONCE per row and hands
    * it to `body` as a lambda variable (a single-element `transform`).
    *
    * Why it exists: Catalyst's CollapseProject inlines a projected column
    * into every reference site, and interpreted higher-order-function
    * lambdas have no common-subexpression elimination — so an expensive
    * expression (e.g. a tokenized array) referenced k times inside a
    * per-element lambda is recomputed k times PER ELEMENT. Binding it as a
    * lambda variable makes every reference a cheap variable read. Measured
    * on the shingle pipeline: ~150 tokenizations per document down to one. */
  def bindOnce(v: Column, body: Column => Column): Column =
    element_at(transform(array(v), body), 1)
}
