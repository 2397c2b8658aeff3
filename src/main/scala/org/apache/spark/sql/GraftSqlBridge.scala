package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 made the Column↔Expression conversions `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so custom native
  * expressions (graft.functions.*) need this one-file shim living in the
  * `org.apache.spark.sql` package to wrap/unwrap them.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a native function on a LIVE session (the public
    * `SparkSessionExtensions.injectFunction` channel only applies at
    * session build time).
    */
  def registerFunction(spark: SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
