package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the `Column(Expression)`
  * constructor private to the sql package (Connect refactor); this is
  * the conventional extension-library shim — same approach as public
  * Spark datasource/extension projects that need to lift a custom
  * Catalyst `Expression` into a user-facing `Column`.
  */
object bridge {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column → Catalyst expression, converted EAGERLY. `expressionOf`
    * wraps the column's node tree in a lazy `ColumnNodeExpression`
    * that only the Dataset API's own analysis path unwraps — an
    * expression returned from a FunctionRegistry builder (the SQL
    * function seam) bypasses that path and must hand the analyzer a
    * real (possibly unresolved) Catalyst tree instead.
    */
  def catalystOf(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
