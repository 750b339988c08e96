package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters.
  * Spark 4 routes Column through ColumnNode (Connect compatibility);
  * `classic.ExpressionUtils` is the sanctioned classic-mode accessor
  * but is package-private, hence this one-file shim in the spark
  * namespace — the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to `Dataset.ofRows` (private[sql]): turn a hand-built
  * logical plan — e.g. a `LogicalRelation` over a custom `FileIndex` —
  * into a user-facing DataFrame. Same extension-library pattern as
  * ColumnBridge above.
  */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
