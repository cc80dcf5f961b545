package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `format: "regex"` predicate (PJS:_format.py is_regex = re.compile):
  * true iff the string value compiles as a regular expression. Codegen'd
  * try/catch around Pattern.compile — no UDF. Dialect caveat mirrors the
  * `pattern` keyword's documented one: Java regex, not ECMA-262 (the
  * reference itself declares ECMA-specific skips,
  * PJS:tests/test_jsonschema_test_suite.py:29-31).
  */
object RegexValidUtil {
  def ok(s: UTF8String): Boolean =
    try { java.util.regex.Pattern.compile(s.toString); true }
    catch {
      case _: Exception => false
      // Pattern's recursive-descent parser blows the stack on deeply
      // nested groups ("(((((…"); arbitrary table data reaches this
      // predicate, and one pathological row must mark itself invalid,
      // not kill the task (and after retries, the whole job)
      case _: StackOverflowError => false
    }
}

case class RegexValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"regex_valid expects a string, got $other")
  }

  override def nullSafeEval(s: Any): Any = RegexValidUtil.ok(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.RegexValidUtil.ok($s)")

  override protected def withNewChildInternal(c: Expression): RegexValid = copy(child = c)
  override def prettyName: String = "regex_valid"
}

object RegexValid {
  def regex_valid(c: Column): Column =
    ColumnBridge.column(RegexValid(ColumnBridge.expression(c)))
}
