package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the package-private Column↔Expression converters, needed to
  * expose custom Catalyst expressions (graft.plans.*) as user-facing
  * `Column`s on Spark 4 (where `new Column(expr)` is no longer public).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode→Expression conversion. [[expression]] returns a lazy
    * `ColumnNodeExpression` wrapper that only the classic Dataset pipeline
    * unwraps — inside a SQL FunctionBuilder (GraftFunctions) the analyzer
    * would see an unresolvable NullType node. This converts the whole
    * tree to catalyst expressions immediately. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
