package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one necessary crossing into Spark's package-private surface:
  * `Dataset.ofRows` (the constructor every extension library uses to
  * turn a hand-built LogicalPlan into a public DataFrame) is
  * `private[sql]`, so this bridge object lives in the `sql` package.
  * Nothing else in the repo touches non-public Spark API.
  */
object GraftSqlBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      session.asInstanceOf[classic.SparkSession], plan)

  /** Column -> Catalyst Expression, converted EAGERLY: the lazy
    * `ExpressionUtils.expression` wrapper defers conversion to the
    * analyzer's own call sites, which never visit expressions inside a
    * third-party logical node — sort columns would reach codegen still
    * wrapped. The eager converter also maps the api-level SortOrder
    * node to a real catalyst SortOrder.
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Catalyst Expression -> Column (the inverse of [[expression]]):
    * wraps a hand-built expression — e.g. one carrying a non-literal
    * payload like a centroid matrix — as a public Column; private[sql]
    * in `classic.ExpressionUtils`, hence bridged.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Float normalization for grouping/partitioning keys (NaN bit
    * patterns, nested -0.0) — the same rule the optimizer applies to
    * Window partition specs; private[sql], hence bridged.
    */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)
}
