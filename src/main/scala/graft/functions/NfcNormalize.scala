package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd scalar — the canonical
  * first step of a text-curation pipeline (normalize BEFORE hashing /
  * dedup / fingerprinting, or byte-identical duplicates diverge on
  * composed-vs-decomposed encodings of the same rendered text).
  *
  * Scale design: two allocation-free fast paths cover the bulk of a
  * web corpus —
  *   1. pure-ASCII bytes are NFC by construction → return the input
  *      UTF8String untouched (single byte scan, no decode);
  *   2. non-ASCII but already-normalized text (most crawl output) →
  *      `Normalizer.isNormalized` quick-check, still no new string.
  * Only text that actually changes pays the normalize + re-encode.
  * Matches DuckDB's `nfc_normalize` (both implement Unicode canonical
  * composition), which is what lets the driver oracle pin it exactly.
  */
object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0) { // non-ASCII byte: leave the fast path
        val str = s.toString
        return if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
        else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects a string, got $other")
  }

  override def nullSafeEval(s: Any): Any = NfcNormalizeUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcNormalizeUtil.nfc($s)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
