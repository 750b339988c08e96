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

/** Bridge to Spark's own Arrow serialization (`execution.arrow
  * .ArrowConverters`, private[sql]) — the exact code path PySpark's
  * `toArrow()` and collect-as-Arrow use, so the emitted batches match
  * what every Arrow consumer of Spark results already parses.
  */
object ArrowBridge {
  import org.apache.spark.sql.{DataFrame, Row, SparkSession}
  import org.apache.spark.sql.classic
  import org.apache.spark.sql.execution.arrow.ArrowConverters

  /** Collect a DataFrame as self-describing Arrow IPC stream chunks
    * (each chunk carries the schema + one record batch).
    */
  def toArrowBatches(df: DataFrame, maxRecordsPerBatch: Long): Array[Array[Byte]] = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val tz = ds.sparkSession.sessionState.conf.sessionLocalTimeZone
    val rows = ds.queryExecution.executedPlan.executeCollect().iterator
    val chunks = ArrowConverters.toBatchWithSchemaIterator(
      rows, ds.schema, maxRecordsPerBatch, Long.MaxValue, tz,
      true, false).toArray
    if (chunks.nonEmpty) chunks
    else Array(ArrowConverters.createEmptyArrowBatch(ds.schema, tz, true, false))
  }

  /** Rebuild a DataFrame from chunks produced by `toArrowBatches` —
    * the schema travels inside the chunks.
    */
  def fromArrowBatches(spark: SparkSession, batches: Iterator[Array[Byte]]): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val (rowIter, schema) =
      ArrowConverters.fromBatchWithSchemaIterator(batches, org.apache.spark.TaskContext.get())
    val rows = rowIter.map(_.copy()).toArray // iterator reuses its row buffer
    cs.internalCreateDataFrame(cs.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
