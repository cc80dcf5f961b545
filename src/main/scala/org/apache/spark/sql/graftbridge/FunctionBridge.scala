package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Runtime function registration into an EXISTING session's registry
  * (the REPL/notebook path; cluster jobs use [[graft.GraftExtensions]]
  * via spark.sql.extensions instead). `sessionState` is private[sql],
  * hence this bridge lives in the org.apache.spark.sql namespace like
  * [[ColumnBridge]].
  */
object FunctionBridge {
  def register(spark: SparkSession, name: String, usage: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        builder)
}
