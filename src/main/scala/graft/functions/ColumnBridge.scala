/* Bridge into Spark's classic Column internals.
 *
 * Spark 4 moved `Column` to a backend-agnostic representation
 * (ColumnNode); wrapping a raw Catalyst `Expression` into a `Column` goes
 * through `org.apache.spark.sql.classic.ExpressionUtils`, which is
 * private[sql]. This one-file shim lives in the sql package namespace to
 * re-export exactly the two conversions a custom-expression library
 * needs — the standard pattern for Spark-native extensions.
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
