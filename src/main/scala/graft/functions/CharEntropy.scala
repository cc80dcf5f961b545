package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char, log2) over a string's code-point
  * frequency distribution — the classic cheap junk detector for text
  * curation: near-zero entropy is degenerate repetition ("aaaa…"),
  * implausibly high entropy is random noise / binary spill; real prose
  * sits in a stable band. One pass to count, one pass over the
  * (≤ alphabet-size) frequency table to sum, no allocation beyond the
  * table — a map-side projection, never a shuffle. Code-point
  * semantics (surrogate pairs count once) to match character-based
  * engines (DuckDB substr/length), not UTF-16 units.
  */
object CharEntropyUtil {
  private val Log2 = Math.log(2.0)

  def entropy(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    // dense ASCII table + spill map: web text is ASCII-dominated, so
    // the common case touches one 128-slot int array, no boxing
    val ascii = new Array[Int](128)
    var spill: java.util.HashMap[Integer, Integer] = null
    var n = 0
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (spill == null) spill = new java.util.HashMap[Integer, Integer]()
        spill.merge(cp, 1, (a, b) => a + b)
      }
      n += 1
      i += Character.charCount(cp)
    }
    val nd = n.toDouble
    var h = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) { val p = k / nd; h -= p * (Math.log(p) / Log2) }
      c += 1
    }
    if (spill != null) {
      val it = spill.values().iterator()
      while (it.hasNext) { val p = it.next().intValue() / nd; h -= p * (Math.log(p) / Log2) }
    }
    h
  }
}

case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"char_entropy expects a string, got $other")
  }

  override def nullSafeEval(s: Any): Any = CharEntropyUtil.entropy(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CharEntropyUtil.entropy($s)")

  override protected def withNewChildInternal(c: Expression): CharEntropy = copy(child = c)
  override def prettyName: String = "char_entropy"
}

object CharEntropy {
  def char_entropy(c: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(c)))
}
