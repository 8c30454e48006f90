package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Column↔Expression conversions, the
  * standard technique for Spark extension libraries that define custom
  * Catalyst expressions (same access pattern spark's own `functions._`
  * uses internally). No Spark internals are modified.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** LocalRelation over pre-built InternalRows — skips the external-Row
    * CatalystTypeConverters pass that `createDataFrame(List[Row], schema)`
    * pays eagerly per row (measurable at per-batch search-result scale:
    * ~3× on result-relation creation). Rows must match `schema` exactly;
    * LocalTableScanExec projects them to UnsafeRow lazily at execution. */
  def localRelationDf(
      spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[org.apache.spark.sql.catalyst.InternalRow])
      : org.apache.spark.sql.DataFrame = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.withActive {
      val rel = org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        rows)
      // A bare LocalRelation of materialized rows is already in optimal
      // form — every optimizer rule is a no-op on it, but the full batch
      // sweep still costs ~14 ms per relation (dev/ResultDfMicro), which
      // at per-search-batch frequency is the dominant framework tax of
      // driver-local serving. Skip straight to the analyzed plan; any
      // DERIVED Dataset composes the logical plan and gets the full
      // pipeline as usual.
      val qe = new org.apache.spark.sql.execution.QueryExecution(session, rel) {
        override def optimizedPlan
            : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
          commandExecuted
      }
      new org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row](
        qe, org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(schema))
    }
  }
}
