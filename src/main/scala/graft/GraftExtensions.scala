package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.GraftFunctions

/** Session-extension entry point — the spark-submit path for the SQL
  * function surface:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * spark.sql("SELECT kll_quantiles(kll_agg(n_tok), array(0.5D)) FROM t")
  * }}}
  *
  * Injection happens at session build, so pure-SQL users (Thrift server,
  * notebooks) get the custom expressions with zero Scala imports. This
  * is build-rule preference (c): registration via SparkSessionExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage),
        builder))
    }
}
