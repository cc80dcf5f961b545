package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Single-pass per-row chunk-window profile for the v_chunk_windows
  * layout (windows of W tokens at stride S over the row's own array):
  * struct(n_windows, n_full, sum_len, ck) in ONE fused loop.
  *
  * Why custom (r6): Spark higher-order functions are CodegenFallback,
  * so the per-window checksum — ~n_tok multiply-adds per row, 264M per
  * scan at sf0.1 — ran interpreted whether expressed as
  * posexplode+zip_with (plus a 128-element slice copy per window) or
  * as nested aggregate() lambdas. This expression keeps whole-stage
  * codegen (doGenCode, the TokenStats pattern; zero UDFs).
  *
  * Exact semantics of the composed form it replaces:
  *  - windows start at 0, S, 2S, … while start < n (none for n == 0);
  *  - window length = min(W, n - start); n_full counts length == W;
  *  - per-window checksum = Σ_j (j+1)·tokens[start+j] (1-based
  *    weights), NULLED-THEN-ZEROED if the window contains any null
  *    element — exactly the coalesce(aggregate(zip_with(...)), 0)
  *    null-poisoning of the original (a null element nulls its whole
  *    window's sum, never its neighbors');
  *  - ck = Σ over the row's windows of the per-window checksum, in a
  *    LONG (window ck ≤ ~W²·max_token/2 and windows-per-row is
  *    n/S — bounded far below 2^63 for any row that fits in memory);
  *    the cross-row DECIMAL(38,0) accumulation stays in the query.
  */
object WindowStatsUtil {
  def compute(a: ArrayData, w: Int, s: Int): InternalRow = {
    val n = a.numElements()
    var nWindows = 0
    var nFull = 0
    var sumLen = 0L
    var ck = 0L
    var st = 0
    while (st < n) {
      val len = math.min(w, n - st)
      nWindows += 1
      if (len == w) nFull += 1
      sumLen += len
      var wc = 0L
      var nulled = false
      var j = 0
      while (j < len && !nulled) {
        if (a.isNullAt(st + j)) nulled = true
        else wc += (j + 1).toLong * a.getInt(st + j)
        j += 1
      }
      if (!nulled) ck += wc
      st += s
    }
    new GenericInternalRow(Array[Any](nWindows, nFull, sumLen, ck))
  }
}

case class WindowStats(child: Expression, w: Int, s: Int) extends UnaryExpression {
  require(w > 0 && s > 0, "window and stride must be positive")
  override def dataType: DataType = WindowStats.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WindowStatsUtil.compute(v.asInstanceOf[ArrayData], w, s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowStatsUtil.compute($c, $w, $s);")

  override protected def withNewChildInternal(newChild: Expression): WindowStats =
    copy(child = newChild)

  override def prettyName: String = "window_stats"
}

object WindowStats {
  val schema: StructType = StructType(Seq(
    StructField("n_windows", IntegerType, nullable = false),
    StructField("n_full", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("ck", LongType, nullable = false)))

  /** Column API: window_stats(tokens, W, S) → struct(n_windows,
    * n_full, sum_len, ck).
    */
  def window_stats(c: Column, w: Int, s: Int): Column =
    ColumnBridge.column(WindowStats(ColumnBridge.expression(c), w, s))
}
