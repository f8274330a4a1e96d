package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. `ExpressionUtils` is `private[sql]`, so the
  * one-line adapters live inside the sql package tree; everything else in
  * this library stays in `graft.*`. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The alias name of a `col.as("name")` column, WITHOUT analyzing it:
    * `expression(c)` wraps the node lazily (ColumnNodeExpression), so a
    * NamedExpression match never fires pre-analysis; the name lives on
    * the ColumnNode itself. */
  def aliasName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.Alias => a.name.headOption
    case _ => None
  }
}
