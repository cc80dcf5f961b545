package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable quantile-sketch aggregates over DataSketches (jar verified in
  * /opt/spark/jars): the BASELINE.json north star names "token-length
  * histograms via t-digest" explicitly; SURVEY.md §4.3.5 defers them
  * behind percentile_approx until a custom TypedImperativeAggregate is
  * warranted. These are that aggregate.
  *
  * Scale design: classic partial+final sketch aggregation — each executor
  * folds its partitions into a local sketch (`update`), only the
  * serialized sketch states (~KB, independent of row count) cross the
  * wire, and the final merge is associative+commutative. At 10^12 rows
  * the shuffled bytes for a full-table quantile profile are
  * #partitions × sketch_size, not data-sized. Both sketches carry exact
  * n/min/max alongside the approximate quantile surface, so the oracle
  * can pin the exact fields while tests bound the approximate ones.
  *
  * Reference seed: minItems/maxItems (PJS:_keywords.py:194-203) lifted
  * from a per-row bound to a full distribution (SURVEY.md §2.5).
  */
object QuantileSketches {

  // ----------------------------------------------------------------- t-digest

  /** t-digest aggregate → serialized TDigestDouble (BinaryType).
    * Extraction via [[TDigestQuantiles]] / [[TDigestCdf]].
    */
  case class TDigestAgg(
      child: Expression,
      k: Short = 200,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestDouble] with UnaryLike[Expression] {

    override def createAggregationBuffer(): TDigestDouble = new TDigestDouble(k)

    override def update(buf: TDigestDouble, input: InternalRow): TDigestDouble = {
      val v = child.eval(input)
      if (v != null) buf.update(numeric(v))
      buf
    }

    override def merge(buf: TDigestDouble, other: TDigestDouble): TDigestDouble = {
      buf.merge(other); buf
    }

    override def eval(buf: TDigestDouble): Any = {
      buf.compress()
      buf.toByteArray
    }

    override def serialize(buf: TDigestDouble): Array[Byte] = { buf.compress(); buf.toByteArray }
    override def deserialize(bytes: Array[Byte]): TDigestDouble =
      TDigestDouble.heapify(Memory.wrap(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): TDigestAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TDigestAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): TDigestAgg = copy(child = c)
    override def prettyName: String = "tdigest_agg"
  }

  /** quantiles(serialized t-digest, probs) → array<double>. Runs once per
    * aggregated group (not per row) — CodegenFallback is free here.
    */
  case class TDigestQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(bin: Any, probs: Any): Any = {
      val td = TDigestDouble.heapify(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
      val ps = probs.asInstanceOf[ArrayData].toDoubleArray()
      new GenericArrayData(ps.map(p => if (td.isEmpty) Double.NaN else td.getQuantile(p)))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): TDigestQuantiles =
      copy(left = l, right = r)
    override def prettyName: String = "tdigest_quantiles"
  }

  /** CDF of a serialized t-digest at the given split points → array<double>
    * (the mergeable substrate for sketch-based KS drift: D = max |cdf_a - cdf_b|).
    */
  case class TDigestCdf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(bin: Any, splits: Any): Any = {
      val td = TDigestDouble.heapify(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
      val ss = splits.asInstanceOf[ArrayData].toDoubleArray()
      if (td.isEmpty) new GenericArrayData(ss.map(_ => Double.NaN))
      else new GenericArrayData(td.getCDF(ss))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): TDigestCdf =
      copy(left = l, right = r)
    override def prettyName: String = "tdigest_cdf"
  }

  /** Exact total weight / min / max carried by a serialized t-digest —
    * these fields are EXACT (not sketched), so they are oracle-comparable.
    */
  case class TDigestSummary(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("min", DoubleType, nullable = false),
      StructField("max", DoubleType, nullable = false)))
    override def nullSafeEval(bin: Any): Any = {
      val td = TDigestDouble.heapify(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
      val (mn, mx) = if (td.isEmpty) (Double.NaN, Double.NaN) else (td.getMinValue, td.getMaxValue)
      InternalRow(td.getTotalWeight, mn, mx)
    }
    override protected def withNewChildInternal(c: Expression): TDigestSummary = copy(child = c)
    override def prettyName: String = "tdigest_summary"
  }

  // ---------------------------------------------------------------------- KLL

  /** KLL quantile sketch aggregate → serialized KllDoublesSketch
    * (BinaryType). KLL has provable worst-case rank error (~1.65% at
    * k=200) where t-digest's is empirical; we ship both and let the
    * caller choose (KLL for guarantees, t-digest for extreme-tail
    * resolution).
    */
  case class KllAgg(
      child: Expression,
      k: Int = 200,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

    override def createAggregationBuffer(): KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(numeric(v))
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other); buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): KllAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KllAgg = copy(child = c)
    override def prettyName: String = "kll_agg"
  }

  /** quantiles(serialized KLL, probs) → array<double> (INCLUSIVE rank). */
  case class KllQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(bin: Any, probs: Any): Any = {
      val s = KllDoublesSketch.heapify(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
      val ps = probs.asInstanceOf[ArrayData].toDoubleArray()
      new GenericArrayData(ps.map(p => if (s.isEmpty) Double.NaN else s.getQuantile(p)))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantiles =
      copy(left = l, right = r)
    override def prettyName: String = "kll_quantiles"
  }

  /** CDF of a serialized KLL sketch at split points → array<double>. */
  case class KllCdf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(bin: Any, splits: Any): Any = {
      val s = KllDoublesSketch.heapify(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
      val ss = splits.asInstanceOf[ArrayData].toDoubleArray()
      if (s.isEmpty) new GenericArrayData(ss.map(_ => Double.NaN))
      else new GenericArrayData(s.getCDF(ss))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): KllCdf =
      copy(left = l, right = r)
    override def prettyName: String = "kll_cdf"
  }

  /** Exact (n, min, max) carried by a serialized KLL sketch. */
  case class KllSummary(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("min", DoubleType, nullable = false),
      StructField("max", DoubleType, nullable = false)))
    override def nullSafeEval(bin: Any): Any = {
      val s = KllDoublesSketch.heapify(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
      val (mn, mx) = if (s.isEmpty) (Double.NaN, Double.NaN) else (s.getMinItem, s.getMaxItem)
      InternalRow(s.getN, mn, mx)
    }
    override protected def withNewChildInternal(c: Expression): KllSummary = copy(child = c)
    override def prettyName: String = "kll_summary"
  }

  // -------------------------------------------------------------- Column API

  private def numeric(v: Any): Double = v match {
    case d: Double => d
    case f: Float  => f.toDouble
    case i: Int    => i.toDouble
    case l: Long   => l.toDouble
    case s: Short  => s.toDouble
    case b: Byte   => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(s"non-numeric sketch input: $other")
  }

  def tdigest_agg(c: Column, k: Short = 200): Column =
    ColumnBridge.column(TDigestAgg(ColumnBridge.expression(c), k).toAggregateExpression())
  def tdigest_quantiles(sketch: Column, probs: Column): Column =
    ColumnBridge.column(TDigestQuantiles(ColumnBridge.expression(sketch), ColumnBridge.expression(probs)))
  def tdigest_cdf(sketch: Column, splits: Column): Column =
    ColumnBridge.column(TDigestCdf(ColumnBridge.expression(sketch), ColumnBridge.expression(splits)))
  def tdigest_summary(sketch: Column): Column =
    ColumnBridge.column(TDigestSummary(ColumnBridge.expression(sketch)))

  def kll_agg(c: Column, k: Int = 200): Column =
    ColumnBridge.column(KllAgg(ColumnBridge.expression(c), k).toAggregateExpression())
  def kll_quantiles(sketch: Column, probs: Column): Column =
    ColumnBridge.column(KllQuantiles(ColumnBridge.expression(sketch), ColumnBridge.expression(probs)))
  def kll_cdf(sketch: Column, splits: Column): Column =
    ColumnBridge.column(KllCdf(ColumnBridge.expression(sketch), ColumnBridge.expression(splits)))
  def kll_summary(sketch: Column): Column =
    ColumnBridge.column(KllSummary(ColumnBridge.expression(sketch)))
}
