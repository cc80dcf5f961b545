package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused cosine similarity of two float/double embedding arrays in one
  * loop, fully codegen'd.
  *
  * Why custom: the composable form (aggregate ∘ zip_with for the dot
  * product plus two aggregate ∘ transform norms) is three interpreted
  * higher-order-function passes with per-row lambda dispatch and two
  * intermediate arrays; at all-pairs scale (the brute-force ANN oracle
  * and the IVF candidate scan) that dominated the embedding queries.
  * One while-loop accumulating dot/na/nb preserves the exact left-to-
  * right double summation order of the composed form, so results are
  * bit-identical (the DuckDB oracle rounds to 4 decimals on the same
  * order).
  *
  * Input contract (round-1 ADVICE, medium): both children MUST be
  * arrays of the SAME float/double element type — enforced at analysis
  * time by [[checkInputDataTypes]] (mixed float/double would read the
  * right array at the wrong element width). Unequal lengths return
  * NULL, matching the composed zip_with form's behavior.
  */
object CosineSimUtil {
  // isNullAt guards both loops: parquet reads report containsNull=true,
  // and a null ELEMENT read via getFloat/getDouble is an unchecked 0.0
  // (UnsafeArrayData) or an NPE (GenericArrayData) — a silently wrong
  // similarity either way. Null element ⇒ null result, matching the
  // composed zip_with form (round-4 review). On the common
  // containsNull=false layout the bitmap check is a cheap word read.
  def cosF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null inputs OR length mismatch

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b && (a == FloatType || a == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects two arrays of the SAME float/double element type, got $l and $r")
  }

  private def fn: String = left.dataType match {
    case ArrayType(FloatType, _) => "cosF"
    case _ => "cosD"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (fn == "cosF") CosineSimUtil.cosF(x, y) else CosineSimUtil.cosD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cos")
      s"""java.lang.Double $tmp = graft.functions.CosineSimUtil.$fn($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
