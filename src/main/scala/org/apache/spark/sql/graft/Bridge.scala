package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 scopes these conversions
  * `private[sql]`; this shim lives under the sql package namespace solely to
  * re-export them for graft's native expressions (public-API pattern for
  * libraries shipping custom Catalyst expressions). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (`Dataset.ofRows` is `private[sql]`);
    * used by the rollup-rewrite demo to apply an optimizer rule to ONE
    * query without touching session-global optimizer state. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Re-export of `ExpectsInputTypes` for expressions living outside the sql
  * package: `AbstractDataType` is `private[sql]` in Spark 4, so a graft
  * expression can't write the `inputTypes: Seq[AbstractDataType]` override
  * directly. Implement `expectedInputTypes` with plain public `DataType`s
  * instead; wrong-typed columns then fail at ANALYSIS time (DATATYPE_MISMATCH)
  * rather than as executor-side ClassCastExceptions. */
trait GraftExpectsInputTypes extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  def expectedInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    expectedInputTypes
}
