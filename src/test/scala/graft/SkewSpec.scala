package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: when a shuffle join's hot key would otherwise
  * serialize one reducer, adaptive execution must split the skewed
  * partition. This pins the THIRD leg of the skew strategy (after
  * broadcast-the-dim and salted two-phase aggs): for joins that must
  * shuffle, AQE's skew-join split is the production lever — and this
  * spec proves the engine's session shape actually triggers it.
  *
  * The consumer of the join is a GLOBAL aggregate (no distribution
  * requirement): a keyed aggregate downstream would legitimately veto
  * the split, because splitting breaks the hash-partitioning the agg
  * wants to reuse — itself a useful thing to know about the planner.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the skewed join partition on a hot key") {
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the 90%-hot-key toy dataset counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the fact side lands on source="web" — the north-star
      // table's documented hot key
      val fact = spark.range(200000).select(
        when(col("id") % 10 < 9, lit("web")).otherwise(lit("books")).as("source"),
        col("id").as("v"))
      val dim = spark.range(40).select(
        when(col("id") % 2 === 0, lit("web")).otherwise(lit("books")).as("source"),
        (col("id") * 7).as("w"))
      val agg = fact.join(dim.hint("merge"), Seq("source"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      // collect(), not head(): head() executes a separate limit-plan
      // QueryExecution, leaving agg.queryExecution un-finalized
      val row = agg.collect()(0)
      // correctness under the split: every (fact, dim) pair exactly once
      val factWeb = (0L until 200000L).filter(_ % 10 < 9)
      val factBooks = (0L until 200000L).filter(_ % 10 >= 9)
      val expN = factWeb.size.toLong * 20 + factBooks.size.toLong * 20
      val expSv = factWeb.sum * 20 + factBooks.sum * 20
      assert(row.getLong(0) === expN)
      assert(row.getLong(1) === expSv)
      val plan = agg.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot-key join as skew-handled:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
