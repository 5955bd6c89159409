package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved the classic `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * Extension libraries that ship native expressions need exactly these two
  * conversions, so this one-file shim lives in the `org.apache.spark.sql`
  * package namespace — the same approach used by published Spark extension
  * projects. No Spark internals are modified; this only re-exports two
  * pure conversion functions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
