package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.suite.NorthStar

/** Measurement probe for the executor-scaling anomaly: run labeled
  * plans under whatever master spark-submit provides, each rep on a
  * FRESH DataFrame (same-Dataset re-execution reuses registered shuffle
  * map outputs — the map stage is skipped and the runtime measures only
  * the final stage; head() vs collect() differ for the same reason:
  * head() builds a new limit plan per call).
  *
  * Usage: spark-submit --master local-cluster[N,8,8192] --class
  *   graft.ClusterProbe <jar> <tokenParquetPath>
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val spark = SparkSession.builder().appName("graft-cluster-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def scan(): DataFrame = spark.read.parquet(path)

    def cnt() = scan().selectExpr("count(*) as c", "sum(n_tok) as s")
    def tok() = scan().selectExpr("sum(aggregate(tokens, 0L, (a, x) -> a + x)) as s")
    def fused() = ConstraintCompiler
      .withVerdicts(scan(), NorthStar.suite, Set("tokens"))
      .agg(count(lit(1)).as("r"), sum(when(!col("row_valid"), 1L).otherwise(0L)).as("v"))

    fused().collect() // warm codegen/JIT/page cache
    Seq("CNT" -> (() => cnt()), "TOK" -> (() => tok()), "FS" -> (() => fused())).foreach {
      case (label, mk) =>
        val best = (1 to 3).map(_ => time(mk().collect())).min
        println(s"GRAFT_PROBE $label best=$best")
    }
    spark.stop()
  }
}
