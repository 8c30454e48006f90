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
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        rows))
}
