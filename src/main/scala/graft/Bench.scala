package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.suite.NorthStar
import graft.gen.TokenData

/** Benchmark main — prints ONE JSON line consumed by the driver.
  *
  * Two measurements:
  *  1. per-query wall time for every SparkEntry query at SPARK_GRAFT_CPUS
  *  2. the BASELINE.json headline metric — validated sequences/sec on the
  *     full north-star suite — at local[8] and local[32] on the SAME
  *     input, with scaling efficiency = (thr32/thr8)/4 (the in-sandbox
  *     stand-in for N→4N executors; target ≥0.8, BASELINE.md).
  */
object Bench {

  private def newSession(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The headline job: full suite over the token table — one scan, all
    * constraints, count rows + row violations (forces every predicate).
    */
  private def fullSuite(spark: SparkSession, path: String): (Long, Long) = {
    val df = ConstraintCompiler.withVerdicts(spark.read.parquet(path), NorthStar.suite, Set("tokens"))
    val r = df.agg(count(lit(1)), sum(when(!col("row_valid"), 1L).otherwise(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt

    // ---- per-query timings at the driver-requested parallelism ----
    var spark = newSession(cpus)
    val tokPath = TokenData.ensure(spark, sfDir) // generation excluded from timings
    // force FULL materialization (a bare .count() lets Catalyst prune
    // the aggregate values away) via the noop sink
    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, warm) = time { exec(fn(spark, sfDir)) } // warm: plan + page cache
      val (_, sec) = time { exec(fn(spark, sfDir)) }
      name -> math.min(warm, sec)
    }

    // ---- scaling probe: full suite at local[8] vs local[32] ----
    def probe(p: Int): (Double, Long) = {
      spark = newSession(p)
      fullSuite(spark, tokPath) // warm (page cache + codegen)
      val ((rows, _), sec) = time { fullSuite(spark, tokPath) }
      (rows / sec, rows)
    }
    val (thr8, rows) = probe(8)
    val (thr32, _) = probe(32)
    val eff = (thr32 / thr8) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""suite_rows":$rows,"rows_per_sec_p8":${thr8.toLong},"rows_per_sec_p32":${thr32.toLong},""" +
      s""""scaling_efficiency_8_to_32":${f"$eff%.3f"}}""")
    spark.stop()
  }
}
