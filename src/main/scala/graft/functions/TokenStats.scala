package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Single-pass fused profile of an int token array:
  * struct(tmin, tmax, dups, n) computed in ONE loop with an
  * open-addressing int set.
  *
  * Why custom: the north-star suite needs per-element min, per-element
  * max, duplicate count (uniqueItems, PJS:_utils.py:156-181) and length
  * of the same array. Composed built-ins traverse the array 4-5 times
  * and `array_distinct` allocates a result array per row; at 10^12 rows
  * x ~264 tokens that is the dominant cost (measured: full-suite scan is
  * ~4x slower un-fused, BENCH notes). A fused Catalyst expression with
  * `doGenCode` keeps whole-stage codegen intact (preference order (b) of
  * the build rules: custom Expression over UDF).
  *
  * Duplicate count semantics: a value occurring k times contributes k-1,
  * identical to size(arr) - size(array_distinct(arr)) — the reference's
  * pairwise-distinctness violation magnitude.
  */
object TokenStatsUtil {
  /** Thread-local reusable open-addressing scratch (values + epoch
    * stamps). A slot is occupied iff stamp == current epoch, so clearing
    * between rows is a single counter increment — ZERO per-row table
    * allocation. (A per-row `new Array[Int]` was measured to collapse
    * multi-core scaling via GC pressure: ~4 KB garbage/row x 10^6 rows/s
    * x 32 threads saturates the collector long before the CPUs.)
    */
  private[functions] final class Scratch {
    var table: Array[Int] = new Array[Int](1024)
    var stamp: Array[Int] = new Array[Int](1024)
    var epoch: Int = 0
    def ensure(n: Int): Int = {
      var cap = table.length
      while (cap < n * 2) cap <<= 1
      if (cap != table.length) { table = new Array[Int](cap); stamp = new Array[Int](cap); epoch = 0 }
      cap
    }
    /** Advance the row epoch; on Int wrap, zero the stamps so a slot
      * stamped exactly 2^32 rows ago can never alias the fresh epoch
      * and fabricate a duplicate (round-4 review: ~1 wrap per 71 min
      * per thread at 10^6 rows/s — the fill costs one pass per 2^31
      * rows, i.e. nothing).
      */
    def nextEpoch(): Int = {
      if (epoch == Int.MaxValue) { java.util.Arrays.fill(stamp, 0); epoch = 0 }
      epoch += 1
      epoch
    }
  }
  private val scratchTL: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  private[functions] def scratch(): Scratch = scratchTL.get()

  /** Hot loop for arrays the SCHEMA proves element-non-null
    * (containsNull = false): no per-element null branch. Called per row
    * from generated code.
    */
  def computeDense(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var dups = 0
    if (n > 0) {
      val s = scratchTL.get()
      val cap = s.ensure(n)
      val mask = cap - 1
      val ep = s.nextEpoch()
      val table = s.table
      val stamp = s.stamp
      var i = 0
      while (i < n) {
        val v = a.getInt(i)
        if (v < mn) mn = v
        if (v > mx) mx = v
        var idx = (v * -1640531527) & mask // Fibonacci hashing (2^32/phi)
        while (stamp(idx) == ep && table(idx) != v) idx = (idx + 1) & mask
        if (stamp(idx) == ep) dups += 1
        else { stamp(idx) = ep; table(idx) = v }
        i += 1
      }
    } else { mn = 0; mx = 0 }
    new GenericInternalRow(Array[Any](mn, mx, dups, n))
  }

  /** Null-AWARE variant for arrays whose schema admits null elements
    * (containsNull = true — what every parquet read reports). A raw
    * getInt on a null slot reads 0, which would (a) fold a phantom 0
    * into tmin/tmax — wrongly failing `items.minimum` rows the
    * null-gated element semantics pass — and (b) collide null with a
    * literal 0 in the duplicate set (round-3 ADVICE, medium). Instead,
    * null elements match the generic compiled path exactly:
    *  - tmin/tmax range over NON-NULL elements only (a null element is
    *    the JSON null instance; `minimum` type-gates to pass on it,
    *    PJS:_keywords.py:150-151) — all-null arrays keep the
    *    MaxValue/MinValue sentinels, which pass every bound exactly
    *    like the generic forall over gated elements;
    *  - dups treats null as ONE distinct value (array_distinct keeps a
    *    single null): the second and later nulls are duplicates;
    *  - n counts every slot, null or not (size() semantics).
    * isNullAt on UnsafeArrayData is a word-aligned bitmap read — the
    * branch costs a few % on the dense case, which keeps its own loop.
    */
  def compute(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var dups = 0
    if (n > 0) {
      val s = scratchTL.get()
      val cap = s.ensure(n)
      val mask = cap - 1
      val ep = s.nextEpoch()
      val table = s.table
      val stamp = s.stamp
      var nulls = 0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) {
          nulls += 1
          if (nulls > 1) dups += 1
        } else {
          val v = a.getInt(i)
          if (v < mn) mn = v
          if (v > mx) mx = v
          var idx = (v * -1640531527) & mask // Fibonacci hashing (2^32/phi)
          while (stamp(idx) == ep && table(idx) != v) idx = (idx + 1) & mask
          if (stamp(idx) == ep) dups += 1
          else { stamp(idx) = ep; table(idx) = v }
        }
        i += 1
      }
    } else { mn = 0; mx = 0 }
    new GenericInternalRow(Array[Any](mn, mx, dups, n))
  }
}

object TokenStatsPackedUtil {
  /** Packed-binary variant of the hot loop: tokens arrive as int32
    * LITTLE-ENDIAN bytes in ONE BinaryType blob per row. Parquet then
    * decodes a single byte_array (a length-prefixed memcpy) instead of
    * materializing per-element UnsafeArrayData — the measured ~57% of
    * full-suite scan time (BASELINE.md decomposition). Same profile
    * semantics as [[TokenStatsUtil.compute]]; null ELEMENTS are
    * unrepresentable by design (token ids are non-null by the table
    * invariant — the packed layout is for the hot path, not for
    * arbitrary JSON arrays).
    */
  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length >>> 2
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var dups = 0
    if (n > 0) {
      val s = TokenStatsUtil.scratch()
      val cap = s.ensure(n)
      val mask = cap - 1
      val ep = s.nextEpoch()
      val table = s.table
      val stamp = s.stamp
      var i = 0
      while (i < n) {
        val o = i << 2
        val v = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | (b(o + 3) << 24)
        if (v < mn) mn = v
        if (v > mx) mx = v
        var idx = (v * -1640531527) & mask
        while (stamp(idx) == ep && table(idx) != v) idx = (idx + 1) & mask
        if (stamp(idx) == ep) dups += 1
        else { stamp(idx) = ep; table(idx) = v }
        i += 1
      }
    } else { mn = 0; mx = 0 }
    new GenericInternalRow(Array[Any](mn, mx, dups, n))
  }

  /** Inverse, for the WRITE path (perf-irrelevant): array<int> → packed
    * LE bytes.
    */
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n << 2)
    var i = 0
    while (i < n) {
      val v = a.getInt(i)
      val o = i << 2
      out(o) = v.toByte
      out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte
      out(o + 3) = (v >> 24).toByte
      i += 1
    }
    out
  }
}

/** token_stats over the packed-binary layout — same output schema. */
case class TokenStatsPacked(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenStats.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TokenStatsPackedUtil.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStatsPackedUtil.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenStatsPacked =
    copy(child = newChild)

  override def prettyName: String = "token_stats_packed"
}

/** array<int> → int32-LE binary blob (the packed-layout writer). */
case class PackInts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TokenStatsPackedUtil.pack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStatsPackedUtil.pack($c);")

  override protected def withNewChildInternal(newChild: Expression): PackInts =
    copy(child = newChild)

  override def prettyName: String = "pack_ints"
}

case class TokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenStats.schema
  override def nullIntolerant: Boolean = true

  // schema-proven element-non-null arrays take the dense loop (no
  // per-element null branch); anything else — including every parquet
  // read, which reports containsNull = true — takes the null-aware
  // loop, whose semantics match the generic null-gated element path
  private def dense: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _                          => false
  }

  override def nullSafeEval(v: Any): Any =
    if (dense) TokenStatsUtil.computeDense(v.asInstanceOf[ArrayData])
    else TokenStatsUtil.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (dense) "computeDense" else "compute"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStatsUtil.$m($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)

  override def prettyName: String = "token_stats"
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("tmin", IntegerType, nullable = false),
    StructField("tmax", IntegerType, nullable = false),
    StructField("dups", IntegerType, nullable = false),
    StructField("n", IntegerType, nullable = false)))

  /** Column API: token_stats(tokens) → struct(tmin, tmax, dups, n). */
  def token_stats(c: Column): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(c)))

  /** Column API over the packed-binary layout. */
  def token_stats_packed(c: Column): Column =
    ColumnBridge.column(TokenStatsPacked(ColumnBridge.expression(c)))

  /** Column API: array<int> → int32-LE binary (packed-layout writer). */
  def pack_ints(c: Column): Column =
    ColumnBridge.column(PackInts(ColumnBridge.expression(c)))
}
